// chattts_native: host-side native runtime pieces (C++17).
//
// Exposed both as a shared library (ctypes entry points, extern "C") and as a
// `chattts-checksum` CLI. Covers the reference's native-code surface on the
// host side:
//   * asset SHA-256 verification / checksum-map generation (replacing the Go
//     tool in tools/checksum/ and the hashing in ChatTTS/utils/dl.py);
//   * peak-normalizing float32 -> int16 PCM quantization (replacing the
//     numba kernel in tools/audio/np.py:7-11), plus interleaving for
//     multi-channel output.

#include <sys/mman.h>
#include <sys/stat.h>
#include <fcntl.h>
#include <unistd.h>

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include "sha256.h"

namespace {

// mmap-based whole-file hash; falls back to streaming reads if mmap fails.
bool HashFile(const char* path, uint8_t out[32]) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return false;
  struct stat st;
  if (::fstat(fd, &st) != 0) {
    ::close(fd);
    return false;
  }
  chattts_native::Sha256 h;
  if (st.st_size > 0) {
    void* p = ::mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
    if (p != MAP_FAILED) {
      ::madvise(p, st.st_size, MADV_SEQUENTIAL);
      h.update(static_cast<const uint8_t*>(p), st.st_size);
      ::munmap(p, st.st_size);
      ::close(fd);
      h.final(out);
      return true;
    }
    std::vector<uint8_t> buf(1 << 20);
    ssize_t n;
    while ((n = ::read(fd, buf.data(), buf.size())) > 0)
      h.update(buf.data(), n);
  }
  ::close(fd);
  h.final(out);
  return true;
}

}  // namespace

extern "C" {

// Hex sha256 of a file; returns 0 on success. `hex_out` must hold 65 bytes.
int chattts_sha256_file(const char* path, char* hex_out) {
  uint8_t digest[32];
  if (!HashFile(path, digest)) return 1;
  std::string hex = chattts_native::Sha256::hex(digest);
  std::memcpy(hex_out, hex.c_str(), 65);
  return 0;
}

// Hex sha256 of a buffer. `hex_out` must hold 65 bytes.
void chattts_sha256_bytes(const uint8_t* data, uint64_t len, char* hex_out) {
  chattts_native::Sha256 h;
  h.update(data, len);
  uint8_t digest[32];
  h.final(digest);
  std::string hex = chattts_native::Sha256::hex(digest);
  std::memcpy(hex_out, hex.c_str(), 65);
}

namespace {

// Quantizer gain matching tools/audio/np.py:7-11: a fixed 32767 gain for
// in-range audio, attenuated only when the peak exceeds full scale
// (integer math: 32767*32768 / (ceil(peak)*32768)).  Quiet audio keeps its
// loudness instead of being peak-normalized up.
float QuantizerScale(const float* in, int64_t n) {
  float peak = 0.0f;
  for (int64_t i = 0; i < n; ++i) {
    float a = std::fabs(in[i]);
    if (a > peak) peak = a;
  }
  int64_t ceil_peak = static_cast<int64_t>(std::ceil(peak));
  if (ceil_peak < 1) ceil_peak = 1;
  return static_cast<float>((32767LL * 32768LL) / (ceil_peak * 32768LL));
}

}  // namespace

// float32 -> int16 quantizer (tools/audio/np.py:7-11 semantics: fixed 32767
// gain, attenuate only when |x|_max > 1, truncate).
void chattts_float_to_int16(const float* in, int64_t n, int16_t* out) {
  const float scale = QuantizerScale(in, n);
  for (int64_t i = 0; i < n; ++i) {
    out[i] = static_cast<int16_t>(in[i] * scale);
  }
}

// Interleave C channel-major float buffers (C, N) -> int16 (N, C) with a
// shared quantizer gain (batch wav export).
void chattts_interleave_to_int16(const float* in, int64_t channels,
                                 int64_t n, int16_t* out) {
  const float scale = QuantizerScale(in, channels * n);
  for (int64_t c = 0; c < channels; ++c) {
    const float* src = in + c * n;
    for (int64_t i = 0; i < n; ++i) {
      out[i * channels + c] = static_cast<int16_t>(src[i] * scale);
    }
  }
}

}  // extern "C"

#ifdef CHATTTS_NATIVE_MAIN
// CLI: chattts-checksum FILE...  -> JSON map {"name": "sha256", ...}
// (same output role as the reference's Go generator feeding
// res/sha256_map.json).
int main(int argc, char** argv) {
  if (argc < 2) {
    std::fprintf(stderr, "usage: %s FILE...\n", argv[0]);
    return 2;
  }
  std::vector<std::string> lines;
  for (int i = 1; i < argc; ++i) {
    uint8_t digest[32];
    if (!HashFile(argv[i], digest)) {
      std::fprintf(stderr, "error hashing %s\n", argv[i]);
      return 1;
    }
    const char* base = std::strrchr(argv[i], '/');
    base = base ? base + 1 : argv[i];
    lines.push_back(std::string("    \"sha256_") + base + "\": \"" +
                    chattts_native::Sha256::hex(digest) + "\"");
  }
  std::printf("{\n");
  for (size_t i = 0; i < lines.size(); ++i)
    std::printf("%s%s\n", lines[i].c_str(),
                i + 1 < lines.size() ? "," : "");
  std::printf("}\n");
  return 0;
}
#endif
