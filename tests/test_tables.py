"""Table generators vs the reference's checked-in generated headers.

The reference treats regeneration+diff of its MakeTables outputs as a
regression test (SURVEY.md section 4); these tests do the same against the
headers in /root/reference (skipped if the reference tree is absent).
"""

import re
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")

pytestmark = pytest.mark.skipif(not REF.exists(),
                                reason="reference tree not available")


def _grab_entries(text, name, pattern=r"\{\s*(\d+),\s*(\d+),\s*(\d+),\s*(\d+)\s*\}"):
    m = re.search(re.escape(name) + r"\[256\] =\s*\{(.*?)\};", text, re.S)
    return np.array(re.findall(pattern, m.group(1)), dtype=np.int32)


def test_s3tc_single_color_tables():
    from convectionkernels_tpu.tables.make_tables import \
        s3tc_single_color_table
    src = (REF / "ConvectionKernels_S3TC_SingleColor.h").read_text()
    configs = {
        "g_singleColor5_3": (5, 3, 0.0), "g_singleColor6_3": (6, 3, 0.0),
        "g_singleColor5_2": (5, 2, 0.0), "g_singleColor6_2": (6, 2, 0.0),
        "g_singleColor5_3_p": (5, 3, 0.03), "g_singleColor6_3_p": (6, 3, 0.03),
        "g_singleColor5_2_p": (5, 2, 0.03), "g_singleColor6_2_p": (6, 2, 0.03),
    }
    for name, (bits, mi, par) in configs.items():
        ref = _grab_entries(src, name)
        assert np.array_equal(ref, s3tc_single_color_table(bits, mi, par)), \
            name


def test_bc7_geometry_derivation():
    from convectionkernels_tpu.tables import bc7_geometry as g
    src = re.sub(r"//[^\n]*", "",
                 (REF / "ConvectionKernels_BC67.cpp").read_text())

    def grab(pat):
        m = re.search(pat + r"[^=]*=\s*\{(.*?)\n            \};", src, re.S)
        return [int(x, 0) for x in re.findall(r"(?:0x[0-9a-fA-F]+|\d+)",
                                              m.group(1))]

    frags = grab(r"g_fragments")
    ranges = np.array(grab(r"g_shapeRanges")).reshape(-1, 2)
    ref_sets = [tuple(frags[s:s + l]) for s, l in ranges]
    assert list(g.shape_pixel_sets()) == ref_sets
    assert np.array_equal(
        np.array(grab(r"g_partitionMap\[64\]")), g.PARTITION_MAP_2)
    assert np.array_equal(np.array(grab(r"g_partitionMap2")),
                          g.PARTITION_MAP_3)
    assert np.array_equal(np.array(grab(r"g_fixupIndexes2")),
                          g.FIXUP_INDEXES_2)
    assert np.array_equal(
        np.array(grab(r"g_fixupIndexes3")).reshape(64, 2), g.FIXUP_INDEXES_3)


def test_etc_tables():
    from convectionkernels_tpu.tables import etc_tables
    src = (REF / "ConvectionKernels_ETC1.h").read_text()
    m = re.search(r"g_potentialOffsets4\[\]\s*=\s*\{(.*?)\};", src, re.S)
    vals = [int(x) for x in re.findall(r"-?\d+", m.group(1))]
    pos = 0
    for t in range(8):
        count = vals[pos]
        pos += 1
        ref = np.array(vals[pos:pos + count], dtype=np.int32)
        pos += count
        assert np.array_equal(ref, etc_tables.potential_offsets(t)), t

    src2 = (REF / "ConvectionKernels_ETC2_Rounding.h").read_text()
    m = re.search(r"g_alphaRoundingTables\[16\]\[13\]\s*=\s*\{(.*?)\};",
                  src2, re.S)
    ref = np.array([int(x) for x in re.findall(r"\d+", m.group(1))],
                   dtype=np.int32).reshape(16, 13)
    assert np.array_equal(ref, etc_tables.alpha_rounding_tables())

    src3 = (REF / "ConvectionKernels_FakeBT709_Rounding.h").read_text()
    m = re.search(r"g_rounding16\[\]\s*=\s*\{(.*?)\};", src3, re.S)
    ref = np.array([int(x) for x in re.findall(r"\d+", m.group(1))],
                   dtype=np.int32)
    assert np.array_equal(ref, etc_tables.fake_bt709_rounding16())


def test_bc7_single_color_tables():
    from convectionkernels_tpu.tables import bc7_single_color
    src = (REF / "ConvectionKernels_BC7_SingleColor.h").read_text()
    # spot check a few named tables against our generated equivalents
    checks = {
        ("g_mode1_p0_i1", 1, 0), ("g_mode2", 2, 0), ("g_mode3_p1", 3, 1),
        ("g_mode6_p0_i4", 6, 3), ("g_mode7_p11", 7, 3),
    }
    for name, mode, pos in checks:
        m = re.search(re.escape(name) + r"=\s*\{.*?\{(.*?)\}\s*\};",
                      src, re.S)
        entries = np.array(
            re.findall(r"\{\s*(\d+),\s*(\d+),\s*(\d+)\s*\}", m.group(1)),
            dtype=np.int32)
        got = bc7_single_color.mode_tables(mode)[pos][2]
        assert np.array_equal(entries, got), name


def test_bc7_plan_matches_reference():
    from tests.oracle.cvtt_oracle import CvttOracle
    from convectionkernels_tpu import bc7_plan

    oracle = CvttOracle("scalar")
    for quality in (0, 10, 37, 50, 85, 100):
        ref = oracle.bc7_plan_from_quality(quality)
        plan = (bc7_plan.plan_from_quality(quality) if quality
                else bc7_plan.BC7EncodingPlan())
        assert plan.mode0_partition_enabled == ref["mode0_partition_enabled"]
        assert plan.mode1_partition_enabled == ref["mode1_partition_enabled"]
        assert plan.mode2_partition_enabled == ref["mode2_partition_enabled"]
        assert plan.mode3_partition_enabled == ref["mode3_partition_enabled"]
        assert plan.mode7_rgba_partition_enabled == \
            ref["mode7_rgba_partition_enabled"]
        assert plan.mode7_rgb_partition_enabled == \
            ref["mode7_rgb_partition_enabled"]
        assert plan.mode6_enabled == ref["mode6_enabled"]
        assert np.array_equal(np.array(plan.mode4_sp), ref["mode4_sp"])
        assert np.array_equal(np.array(plan.mode5_sp), ref["mode5_sp"])
        assert np.array_equal(np.array(plan.seed_points_for_shape_rgb),
                              ref["seed_points_for_shape_rgb"])
        assert np.array_equal(np.array(plan.seed_points_for_shape_rgba),
                              ref["seed_points_for_shape_rgba"])
        assert np.array_equal(
            np.array(plan.rgb_shape_list),
            ref["rgb_shape_list"][:ref["rgb_num_shapes"]])
        assert np.array_equal(
            np.array(plan.rgba_shape_list),
            ref["rgba_shape_list"][:ref["rgba_num_shapes"]])
