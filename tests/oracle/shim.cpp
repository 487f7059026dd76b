// C ABI shim around the reference CVTT library (compiled from /root/reference,
// never copied). Used ONLY by the test/bench harness as the bit-exactness oracle
// and CPU performance baseline. Two builds exist:
//   liboracle_scalar.so  -- reference scalar ParallelMath (-U__SSE2__): the
//                           bit-exactness oracle (portably-defined float semantics;
//                           the SSE2 build's _mm_rcp_ps is CPU-model-dependent).
//   liboracle_sse2.so    -- reference SSE2 build at -O2: the performance baseline.
//
// Reference entry points wrapped: cvtt::Kernels::* (ConvectionKernels.h:236-277).
// Every reference call processes cvtt::NumParallelBlocks == 8 blocks; callers of
// this shim pass any multiple of 8.
#include <cstdint>
#include <cstdlib>
#include <cstring>

#include "ConvectionKernels.h"

using namespace cvtt;

namespace {

Options MakeOptions(uint32_t flags, float threshold, const float *weights,
                    int rrBC7, int rrBC6H, int rrIIC, int rrS3TC, int seedPoints) {
  Options o;
  o.flags = flags;
  o.threshold = threshold;
  o.redWeight = weights[0];
  o.greenWeight = weights[1];
  o.blueWeight = weights[2];
  o.alphaWeight = weights[3];
  o.refineRoundsBC7 = rrBC7;
  o.refineRoundsBC6H = rrBC6H;
  o.refineRoundsIIC = rrIIC;
  o.refineRoundsS3TC = rrS3TC;
  o.seedPoints = seedPoints;
  return o;
}

void *MallocShim(void *, size_t size) { return malloc(size); }
void FreeShim(void *, void *ptr, size_t) { free(ptr); }

}  // namespace

extern "C" {

// All encode entry points: pixels is numBlocks*16*4 u8 (or s8/s16 as noted),
// numBlocks must be a multiple of 8, out receives numBlocks * blockSize bytes.

#define OPTS_PARAMS                                                       \
  uint32_t flags, float threshold, const float *weights, int rrBC7,       \
      int rrBC6H, int rrIIC, int rrS3TC, int seedPoints
#define OPTS_ARGS flags, threshold, weights, rrBC7, rrBC6H, rrIIC, rrS3TC, seedPoints

void cvtt_encode_bc1(uint8_t *out, const uint8_t *pixels, int64_t numBlocks, OPTS_PARAMS) {
  Options o = MakeOptions(OPTS_ARGS);
  const PixelBlockU8 *blocks = reinterpret_cast<const PixelBlockU8 *>(pixels);
  for (int64_t base = 0; base < numBlocks; base += NumParallelBlocks)
    Kernels::EncodeBC1(out + base * 8, blocks + base, o);
}

void cvtt_encode_bc2(uint8_t *out, const uint8_t *pixels, int64_t numBlocks, OPTS_PARAMS) {
  Options o = MakeOptions(OPTS_ARGS);
  const PixelBlockU8 *blocks = reinterpret_cast<const PixelBlockU8 *>(pixels);
  for (int64_t base = 0; base < numBlocks; base += NumParallelBlocks)
    Kernels::EncodeBC2(out + base * 16, blocks + base, o);
}

void cvtt_encode_bc3(uint8_t *out, const uint8_t *pixels, int64_t numBlocks, OPTS_PARAMS) {
  Options o = MakeOptions(OPTS_ARGS);
  const PixelBlockU8 *blocks = reinterpret_cast<const PixelBlockU8 *>(pixels);
  for (int64_t base = 0; base < numBlocks; base += NumParallelBlocks)
    Kernels::EncodeBC3(out + base * 16, blocks + base, o);
}

void cvtt_encode_bc4u(uint8_t *out, const uint8_t *pixels, int64_t numBlocks, OPTS_PARAMS) {
  Options o = MakeOptions(OPTS_ARGS);
  const PixelBlockU8 *blocks = reinterpret_cast<const PixelBlockU8 *>(pixels);
  for (int64_t base = 0; base < numBlocks; base += NumParallelBlocks)
    Kernels::EncodeBC4U(out + base * 8, blocks + base, o);
}

void cvtt_encode_bc4s(uint8_t *out, const int8_t *pixels, int64_t numBlocks, OPTS_PARAMS) {
  Options o = MakeOptions(OPTS_ARGS);
  const PixelBlockS8 *blocks = reinterpret_cast<const PixelBlockS8 *>(pixels);
  for (int64_t base = 0; base < numBlocks; base += NumParallelBlocks)
    Kernels::EncodeBC4S(out + base * 8, blocks + base, o);
}

void cvtt_encode_bc5u(uint8_t *out, const uint8_t *pixels, int64_t numBlocks, OPTS_PARAMS) {
  Options o = MakeOptions(OPTS_ARGS);
  const PixelBlockU8 *blocks = reinterpret_cast<const PixelBlockU8 *>(pixels);
  for (int64_t base = 0; base < numBlocks; base += NumParallelBlocks)
    Kernels::EncodeBC5U(out + base * 16, blocks + base, o);
}

void cvtt_encode_bc5s(uint8_t *out, const int8_t *pixels, int64_t numBlocks, OPTS_PARAMS) {
  Options o = MakeOptions(OPTS_ARGS);
  const PixelBlockS8 *blocks = reinterpret_cast<const PixelBlockS8 *>(pixels);
  for (int64_t base = 0; base < numBlocks; base += NumParallelBlocks)
    Kernels::EncodeBC5S(out + base * 16, blocks + base, o);
}

// quality: 0 => default BC7EncodingPlan (max quality); 1..100 => configured plan.
void cvtt_encode_bc7(uint8_t *out, const uint8_t *pixels, int64_t numBlocks, int quality, OPTS_PARAMS) {
  Options o = MakeOptions(OPTS_ARGS);
  BC7EncodingPlan plan;
  if (quality > 0)
    Kernels::ConfigureBC7EncodingPlanFromQuality(plan, quality);
  const PixelBlockU8 *blocks = reinterpret_cast<const PixelBlockU8 *>(pixels);
  for (int64_t base = 0; base < numBlocks; base += NumParallelBlocks)
    Kernels::EncodeBC7(out + base * 16, blocks + base, o, plan);
}

// pixels: numBlocks*16*4 int16 (half-float bits)
void cvtt_encode_bc6h(uint8_t *out, const int16_t *pixels, int64_t numBlocks, int isSigned, OPTS_PARAMS) {
  Options o = MakeOptions(OPTS_ARGS);
  const PixelBlockF16 *blocks = reinterpret_cast<const PixelBlockF16 *>(pixels);
  for (int64_t base = 0; base < numBlocks; base += NumParallelBlocks) {
    if (isSigned)
      Kernels::EncodeBC6HS(out + base * 16, blocks + base, o);
    else
      Kernels::EncodeBC6HU(out + base * 16, blocks + base, o);
  }
}

void cvtt_encode_etc1(uint8_t *out, const uint8_t *pixels, int64_t numBlocks, OPTS_PARAMS) {
  Options o = MakeOptions(OPTS_ARGS);
  ETC1CompressionData *data = Kernels::AllocETC1Data(MallocShim, nullptr);
  const PixelBlockU8 *blocks = reinterpret_cast<const PixelBlockU8 *>(pixels);
  for (int64_t base = 0; base < numBlocks; base += NumParallelBlocks)
    Kernels::EncodeETC1(out + base * 8, blocks + base, o, data);
  Kernels::ReleaseETC1Data(data, FreeShim);
}

// mode: 0 = ETC2 RGB, 1 = ETC2 RGBA, 2 = ETC2 punchthrough alpha
void cvtt_encode_etc2(uint8_t *out, const uint8_t *pixels, int64_t numBlocks, int mode, OPTS_PARAMS) {
  Options o = MakeOptions(OPTS_ARGS);
  ETC2CompressionData *data = Kernels::AllocETC2Data(MallocShim, nullptr, o);
  const PixelBlockU8 *blocks = reinterpret_cast<const PixelBlockU8 *>(pixels);
  int blockSize = (mode == 1) ? 16 : 8;
  for (int64_t base = 0; base < numBlocks; base += NumParallelBlocks) {
    uint8_t *pBC = out + base * blockSize;
    if (mode == 0)
      Kernels::EncodeETC2(pBC, blocks + base, o, data);
    else if (mode == 1)
      Kernels::EncodeETC2RGBA(pBC, blocks + base, o, data);
    else
      Kernels::EncodeETC2PunchthroughAlpha(pBC, blocks + base, o, data);
  }
  Kernels::ReleaseETC2Data(data, FreeShim);
}

void cvtt_encode_etc2_alpha(uint8_t *out, const uint8_t *pixels, int64_t numBlocks, OPTS_PARAMS) {
  Options o = MakeOptions(OPTS_ARGS);
  const PixelBlockU8 *blocks = reinterpret_cast<const PixelBlockU8 *>(pixels);
  for (int64_t base = 0; base < numBlocks; base += NumParallelBlocks)
    Kernels::EncodeETC2Alpha(out + base * 8, blocks + base, o);
}

// pixels: numBlocks*16 int16 scalar values
void cvtt_encode_eac11(uint8_t *out, const int16_t *pixels, int64_t numBlocks, int isSigned, OPTS_PARAMS) {
  Options o = MakeOptions(OPTS_ARGS);
  const PixelBlockScalarS16 *blocks = reinterpret_cast<const PixelBlockScalarS16 *>(pixels);
  for (int64_t base = 0; base < numBlocks; base += NumParallelBlocks)
    Kernels::EncodeETC2Alpha11(out + base * 8, blocks + base, isSigned, o);
}

void cvtt_decode_bc7(uint8_t *pixelsOut, const uint8_t *blocksIn, int64_t numBlocks) {
  PixelBlockU8 *pixels = reinterpret_cast<PixelBlockU8 *>(pixelsOut);
  for (int64_t base = 0; base < numBlocks; base += NumParallelBlocks)
    Kernels::DecodeBC7(pixels + base, blocksIn + base * 16);
}

void cvtt_decode_bc6h(int16_t *pixelsOut, const uint8_t *blocksIn, int64_t numBlocks, int isSigned) {
  PixelBlockF16 *pixels = reinterpret_cast<PixelBlockF16 *>(pixelsOut);
  for (int64_t base = 0; base < numBlocks; base += NumParallelBlocks) {
    if (isSigned)
      Kernels::DecodeBC6HS(pixels + base, blocksIn + base * 16);
    else
      Kernels::DecodeBC6HU(pixels + base, blocksIn + base * 16);
  }
}

// Expose the BC7 encoding plan produced by ConfigureBC7EncodingPlanFromQuality
// so the JAX encoder can be configured identically. Fields serialized in a
// fixed order into a flat byte buffer (see cvtt_oracle.py for the layout).
void cvtt_bc7_plan_from_quality(uint8_t *out, int quality) {
  BC7EncodingPlan plan;
  if (quality > 0)
    Kernels::ConfigureBC7EncodingPlanFromQuality(plan, quality);
  uint8_t *p = out;
  memcpy(p, &plan.mode1PartitionEnabled, 8); p += 8;
  memcpy(p, &plan.mode2PartitionEnabled, 8); p += 8;
  memcpy(p, &plan.mode3PartitionEnabled, 8); p += 8;
  memcpy(p, &plan.mode0PartitionEnabled, 2); p += 2;
  memcpy(p, &plan.mode7RGBAPartitionEnabled, 8); p += 8;
  memcpy(p, &plan.mode7RGBPartitionEnabled, 8); p += 8;
  memcpy(p, &plan.mode4SP[0][0], 8); p += 8;
  memcpy(p, &plan.mode5SP[0], 4); p += 4;
  *p++ = plan.mode6Enabled ? 1 : 0;
  memcpy(p, plan.seedPointsForShapeRGB, BC7EncodingPlan::kNumRGBShapes); p += BC7EncodingPlan::kNumRGBShapes;
  memcpy(p, plan.seedPointsForShapeRGBA, BC7EncodingPlan::kNumRGBAShapes); p += BC7EncodingPlan::kNumRGBAShapes;
  memcpy(p, plan.rgbaShapeList, BC7EncodingPlan::kNumRGBAShapes); p += BC7EncodingPlan::kNumRGBAShapes;
  *p++ = plan.rgbaNumShapesToEvaluate;
  memcpy(p, plan.rgbShapeList, BC7EncodingPlan::kNumRGBShapes); p += BC7EncodingPlan::kNumRGBShapes;
  *p++ = plan.rgbNumShapesToEvaluate;
}

}  // extern "C"
