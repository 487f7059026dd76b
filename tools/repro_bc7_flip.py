"""Reproduce the smooth-corpus BC7 q50 TPU-vs-oracle flips and isolate them.

Usage: python tools/repro_bc7_flip.py [cpu|tpu]
"""

import os
import sys

if len(sys.argv) > 1 and sys.argv[1] == "cpu":
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_cpu_max_isa=AVX")
    import jax
    jax.config.update("jax_platforms", "cpu")
else:
    import jax

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from convectionkernels_tpu.utils import cache as _cache  # noqa: E402

_cache.enable()

from tests.test_quality_corpus import corpus_images, _blockify  # noqa: E402
from tests.oracle.cvtt_oracle import CvttOracle, OracleOptions  # noqa: E402

import convectionkernels_tpu as ck  # noqa: E402


def main():
    print("platform:", jax.devices())
    images = corpus_images()
    blocks = _blockify(images["smooth"])
    oracle = CvttOracle("scalar")
    ref = oracle.encode_bc7(blocks, OracleOptions(), 50)
    got = np.asarray(ck.encode_bc7(blocks, quality=50))
    bad = np.nonzero(~np.all(got == ref, axis=1))[0]
    print("flips:", bad.tolist())
    for i in bad[:4]:
        print(f"block {i}:")
        print("  pixels:", blocks[i].reshape(-1).tolist())
        print("  ours:  ", got[i].tolist())
        print("  oracle:", ref[i].tolist())
    np.save("/tmp/bc7_flip_blocks.npy", blocks[bad] if len(bad) else blocks[:0])


if __name__ == "__main__":
    main()
