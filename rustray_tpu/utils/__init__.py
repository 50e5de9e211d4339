"""Host utilities: math, downloads."""
