"""Utilities: torch checkpoint conversion, camera-path synthesis, image
helpers, profiling timers."""
