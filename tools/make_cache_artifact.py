"""Regenerate tests/compile_cache_light.tar.gz — the primed XLA compile
cache for the fast verification tier.

Runs tests/test_light_options.py (every codec family, reduced search
rounds) against a FRESH cache directory, then tars the resulting
entries. A reviewer's cold `pytest tests/test_light_options.py` then
completes in ~5-6 minutes instead of ~8+ (1-CPU box; the remaining
time is oracle compilation and the test bodies, not XLA compiles;
conftest extracts the artifact automatically). Rerun this after
changing any encoder graph.

Usage: python tools/make_cache_artifact.py
"""

import os
import subprocess
import sys
import tarfile
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    fresh = tempfile.mkdtemp(prefix="lightcache")
    env = dict(os.environ)
    env["JAX_COMPILATION_CACHE_DIR"] = fresh
    print(f"compiling light tier into {fresh} (several minutes cold)...",
          flush=True)
    rc = subprocess.call(
        [sys.executable, "-m", "pytest", "tests/test_light_options.py",
         "-q", "--no-header"], cwd=REPO, env=env)
    if rc != 0:
        raise SystemExit(f"light tier failed (rc={rc}); artifact NOT built")

    out = os.path.join(REPO, "tests", "compile_cache_light.tar.gz")
    entries = [f for f in os.listdir(fresh) if not f.startswith(".")]
    with tarfile.open(out, "w:gz") as tf:
        for f in entries:
            tf.add(os.path.join(fresh, f), arcname=f)
    size = os.path.getsize(out) / 1e6
    print(f"wrote {out}: {len(entries)} entries, {size:.1f} MB")


if __name__ == "__main__":
    main()
