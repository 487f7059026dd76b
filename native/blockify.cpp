// Host-side native fast paths for the TPU encode pipeline.
//
// The reference's host loop (etc2packer.cpp:222-281) blockifies the image
// and batches encode calls; here the analogous host-side hot paths —
// blockify/unblockify with edge clamping and raster-order block assembly —
// are C++ with a ctypes ABI, since they sit on the host critical path
// between image IO and device transfer.
//
// Build: see convectionkernels_tpu/utils/native.py (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstring>

extern "C" {

// image: [h, w, 4] u8 -> blocks: [ceil(h/4)*ceil(w/4), 16, 4] u8,
// raster block order, edge-clamped.
void ck_blockify(const uint8_t *image, int64_t h, int64_t w,
                 uint8_t *blocks) {
  const int64_t bw = (w + 3) / 4;
  const int64_t bh = (h + 3) / 4;
  for (int64_t by = 0; by < bh; by++) {
    for (int64_t bx = 0; bx < bw; bx++) {
      uint8_t *dst = blocks + ((by * bw + bx) * 16) * 4;
      for (int64_t py = 0; py < 4; py++) {
        int64_t sy = by * 4 + py;
        if (sy >= h) sy = h - 1;
        for (int64_t px = 0; px < 4; px++) {
          int64_t sx = bx * 4 + px;
          if (sx >= w) sx = w - 1;
          std::memcpy(dst + (py * 4 + px) * 4, image + (sy * w + sx) * 4, 4);
        }
      }
    }
  }
}

// blocks: [bh*bw, 16, 4] -> image [h, w, 4]
void ck_unblockify(const uint8_t *blocks, int64_t h, int64_t w,
                   uint8_t *image) {
  const int64_t bw = (w + 3) / 4;
  for (int64_t y = 0; y < h; y++) {
    for (int64_t x = 0; x < w; x++) {
      const int64_t by = y / 4, bx = x / 4;
      const uint8_t *src =
          blocks + (((by * bw + bx) * 16) + (y % 4) * 4 + (x % 4)) * 4;
      std::memcpy(image + (y * w + x) * 4, src, 4);
    }
  }
}

// Interleave two 8-byte-per-block streams into 16-byte blocks
// (EncodeETC2RGBA layout, API.cpp:270-286: alpha block then color block).
void ck_interleave8(const uint8_t *a, const uint8_t *b, int64_t num_blocks,
                    uint8_t *out) {
  for (int64_t i = 0; i < num_blocks; i++) {
    std::memcpy(out + i * 16, a + i * 8, 8);
    std::memcpy(out + i * 16 + 8, b + i * 8, 8);
  }
}

}  // extern "C"
