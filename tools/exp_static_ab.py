"""Throwaway A/B: full-render throughput with the dynamic front-to-back
block traversal forced OFF (static unrolled sweep) for a given scene.

Usage: python tools/exp_static_ab.py [scene_id] [k=v overrides...]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from rtw_tpu.ops import trace_kernel as TK

TK._is_dynamic = lambda e: False

from bench_scenes import main  # noqa: E402

if __name__ == "__main__":
    main(sys.argv[1:])
