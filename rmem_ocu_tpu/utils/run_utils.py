"""Run infrastructure: stdout tee, timestamped log dirs, source snapshot.

Reference: aot_plus/utils/utils.py:44-100 (Tee, make_log_dir, copy_codes).
"""
from __future__ import annotations

import os
import shutil
import sys
import time


class Tee:
    """Mirror stdout/stderr to a log file (reference utils.py:81-100)."""

    def __init__(self, path: str, mode: str = 'a'):
        os.makedirs(os.path.dirname(path) or '.', exist_ok=True)
        self.file = open(path, mode)
        self.stdout = sys.stdout
        sys.stdout = self

    def close(self):
        sys.stdout = self.stdout
        self.file.close()

    def write(self, data):
        self.file.write(data)
        self.stdout.write(data)
        self.flush()

    def flush(self):
        self.file.flush()
        self.stdout.flush()


def enable_compile_cache(path: str = '~/.cache/jax'):
    """Turn on JAX's persistent compilation cache. First compile of the
    full model costs minutes (tens of minutes over the axon tunnel);
    every identical program afterwards loads from disk. Safe to call
    repeatedly; silently a no-op if the config knob is unavailable."""
    import jax
    try:
        jax.config.update('jax_compilation_cache_dir',
                          os.path.expanduser(path))
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass


def make_log_dir(root: str, prefix: str = '') -> str:
    stamp = time.strftime('%Y%m%d-%H%M%S')
    path = os.path.join(root, f'{prefix}{stamp}')
    os.makedirs(path, exist_ok=True)
    return path


def copy_codes(log_dir: str, src_root: str = None):
    """Snapshot all package sources into the log dir
    (reference utils.py:66-73)."""
    src_root = src_root or os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    dst = os.path.join(log_dir, 'code_snapshot')
    for dirpath, dirnames, filenames in os.walk(src_root):
        dirnames[:] = [d for d in dirnames
                       if d not in ('__pycache__', '.git', 'results')]
        for fn in filenames:
            if fn.endswith(('.py', '.sh', '.md')):
                src = os.path.join(dirpath, fn)
                rel = os.path.relpath(src, src_root)
                out = os.path.join(dst, rel)
                os.makedirs(os.path.dirname(out), exist_ok=True)
                shutil.copyfile(src, out)
    return dst
