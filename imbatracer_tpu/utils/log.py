"""Structured logging for the framework.

Upgrades the reference's `std::cout` prose logging
(reference: frontend/build_scene.cpp:550-648 "[1/5].." phases) to a
standard configurable logger; bench harnesses parse the perf lines the
frontend emits, not these.
"""

import logging
import os

logger = logging.getLogger("imbatracer_tpu")
if not logger.handlers:
    _h = logging.StreamHandler()
    _h.setFormatter(logging.Formatter("[%(levelname).1s %(name)s] %(message)s"))
    logger.addHandler(_h)
    logger.setLevel(os.environ.get("IMBATRACER_LOG", "INFO").upper())
