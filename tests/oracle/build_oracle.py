"""Build the reference CVTT oracle shared libraries.

Compiles the reference sources from /root/reference out-of-tree (nothing is
copied into this repo) together with tests/oracle/shim.cpp into:

  build/liboracle_scalar.so -- scalar ParallelMath build (-U__SSE2__):
                               the bit-exactness oracle.
  build/liboracle_sse2.so   -- SSE2 build at -O2: the performance baseline.

The scalar build is the oracle because its float semantics are portable and
well-defined (Reciprocal == exact 1/x, round-to-nearest == floor(x+0.5);
ConvectionKernels_ParallelMath.h:1456,1677), whereas the SSE2 build's
_mm_rcp_ps (ParallelMath.h:569) is CPU-model-dependent.
"""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
REFERENCE = Path("/root/reference")
BUILD = REPO / "build"
SHIM = Path(__file__).resolve().parent / "shim.cpp"

SOURCES = [
    "ConvectionKernels_API.cpp",
    "ConvectionKernels_BC67.cpp",
    "ConvectionKernels_BC6H_IO.cpp",
    "ConvectionKernels_BC7_PrioData.cpp",
    "ConvectionKernels_BCCommon.cpp",
    "ConvectionKernels_ETC.cpp",
    "ConvectionKernels_IndexSelector.cpp",
    "ConvectionKernels_S3TC.cpp",
    "ConvectionKernels_Util.cpp",
]

COMMON_FLAGS = [
    "-O2",
    "-fPIC",
    "-shared",
    "-std=c++14",
    f"-I{REFERENCE}",
]


def build(name: str, extra_flags: list[str]) -> Path:
    out = BUILD / name
    BUILD.mkdir(exist_ok=True)
    srcs = [str(SHIM)] + [str(REFERENCE / s) for s in SOURCES]
    cmd = ["g++"] + COMMON_FLAGS + extra_flags + srcs + ["-o", str(out)]
    subprocess.run(cmd, check=True)
    return out


def ensure_built() -> tuple[Path, Path]:
    """Build (if stale) and return (scalar_so, sse2_so)."""
    scalar = BUILD / "liboracle_scalar.so"
    sse2 = BUILD / "liboracle_sse2.so"
    deps = [SHIM] + [REFERENCE / s for s in SOURCES]
    newest_dep = max(p.stat().st_mtime for p in deps if p.exists())
    if not scalar.exists() or scalar.stat().st_mtime < newest_dep:
        # -ftrivial-auto-var-init=zero: the reference's BC6H packer has a
        # real uninitialized-memory bug -- PackingVector::InitPacked
        # (BC67.cpp:666-671) copies only words 0..2 of the header, leaving
        # m_vector[3] (block bits 96..127) as stack garbage that Pack()
        # then ORs the index bits into (BC67.cpp:674-685, used at
        # :3030-3046). The emitted BC6H bits 96+ are therefore
        # UB-dependent (observed: stray bits OR'd into pixel-5/6 indexes).
        # Zero-initializing locals pins the UB to the intended semantics
        # (garbage == 0), which is the behavior this framework implements.
        build("liboracle_scalar.so", ["-U__SSE2__",
                                      "-ftrivial-auto-var-init=zero"])
    if not sse2.exists() or sse2.stat().st_mtime < newest_dep:
        build("liboracle_sse2.so", [])
    return scalar, sse2


if __name__ == "__main__":
    scalar, sse2 = ensure_built()
    print(f"built {scalar}\nbuilt {sse2}")
    sys.exit(0)
