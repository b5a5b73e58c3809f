"""Global inference lock: the stdlib HTTP server is threaded, but heavy
generation requests must serialize — concurrent first-compiles of large
graphs thrash the compiler and HBM (the reference is effectively serial
too: one Gradio queue, one GPU)."""

from __future__ import annotations

import threading

INFERENCE_LOCK = threading.RLock()
