import numpy as np

from rustray_tpu.scene.animation import Animation, Frame, Keyframe
from rustray_tpu.utils.mathutil import compose_trs


def _anim():
    return Animation(enabled=True, fps=25, keyframes=[
        Keyframe(0, [Frame("obj", np.array([0.0, 0, 0]), np.array([0.0, 0, 0]),
                           np.array([1.0, 1, 1]))]),
        Keyframe(2000, [Frame("obj", np.array([10.0, 0, 0]), np.array([0.0, np.pi, 0]),
                              np.array([1.0, 1, 1]))]),
    ])


def test_has_animation_rules():
    a = _anim()
    assert a.has_animation()
    a.enabled = False
    assert not a.has_animation()
    a.enabled = True
    a.keyframes[0].time = 5  # first keyframe must be at t=0
    assert not a.has_animation()
    b = Animation(enabled=True, keyframes=[Keyframe(0, [])])
    assert not b.has_animation()  # needs >= 2 keyframes


def test_frames_amount():
    # floor(25 fps * 2 s) = 50 (src/animation.rs:95-107)
    assert _anim().get_frames_amount_to_render() == 50


def test_keyframe_bracketing_and_lerp():
    a = _anim()
    first, last, f = a.get_keyframes_for_frame(25)  # t = 1000 ms
    assert first.time == 0 and last.time == 2000
    assert np.isclose(f, 0.5)
    m = a.get_trans_for_frame(25, "obj")
    expected = compose_trs(np.eye(4), (5.0, 0, 0), (1, 1, 1), (0, np.pi / 2, 0))
    np.testing.assert_allclose(m, expected, atol=1e-5)


def test_frame_zero_is_initial():
    m = _anim().get_trans_for_frame(0, "obj")
    np.testing.assert_allclose(m, np.eye(4), atol=1e-6)


def test_unknown_object_is_none():
    assert _anim().get_trans_for_frame(10, "nope") is None


def test_scene_apply_frame():
    import rustray_tpu as rt
    from rustray_tpu.models.procedural import demo_spheres_scene
    scene = demo_spheres_scene(16, 12)
    scene.animation = Animation(enabled=True, fps=10, keyframes=[
        Keyframe(0, [Frame("sphere0", np.array([0.0, 0, -6]), None, None)]),
        Keyframe(1000, [Frame("sphere0", np.array([5.0, 0, -6]), None, None)]),
    ])
    assert scene.frame_exists(5)
    assert not scene.frame_exists(10)
    scene.apply_frame(5)
    item = scene.get_by_name("sphere0")
    np.testing.assert_allclose(item.basic.trans[:3, 3], [2.5, 0, -6], atol=1e-5)
