"""HTTP asset download — src/helper.rs:22-33.

Used by the JSON loader for scenes that reference remote GLB assets
(src/scene.rs:468-493).  In airgapped environments the download fails
gracefully and the loader reports an error like the reference does.
"""
from __future__ import annotations

import os
import urllib.request


def download(url: str, local_path: str, timeout: float = 30.0) -> bool:
    try:
        os.makedirs(os.path.dirname(local_path) or ".", exist_ok=True)
        with urllib.request.urlopen(url, timeout=timeout) as resp:
            if resp.status != 200:
                return False
            data = resp.read()
        with open(local_path, "wb") as f:
            f.write(data)
        return True
    except Exception:
        return False
