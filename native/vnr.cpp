// VNR (VideoNavQA Records) — packed dataset format + threaded batch loader.
//
// The reference feeds training through torch DataLoader worker processes that
// re-decode mp4s every epoch (eval/dataset.py:57-106). For TPU hosts this
// C++ loader replaces that path: videos are packed once into a single
// zlib-per-frame record file, and batches are assembled by a native thread
// pool that decompresses, temporally subsamples (one random frame per 4-frame
// bucket into the fixed 35-frame container, eval/dataset.py:80-89) and writes
// directly into the caller's pinned output buffers. Exposed to Python via a
// plain C ABI (ctypes).
//
// The same container also carries precomputed frozen-stem features
// (cli/extract_features.py): a "frame" is then a [10, 13, 512] bf16 or fp8
// plane instead of a [160, 208, 3] u8 image. The payload code lives in the
// high byte of the flags field:
//   0 or 1 = u8 video frames (legacy files wrote 0; pack_dataset writes 1)
//   2      = bf16 feature planes (2 bytes/elem, u16 bit patterns)
//   3      = float8_e4m3 feature planes (1 byte/elem)
//
// File layout (little-endian):
//   magic 'VNR1' | u32 version | u32 num_examples | u16 H | u16 W | u16 C
//   | u16 flags (low byte: 0 = raw frames, 1 = zlib frames, 2 = zstd frames;
//                high byte: payload code above)
//   [version >= 2] u8 fingerprint[16] — provenance hash of whatever produced
//     the payload (for feature caches: the frozen-stem weights +
//     compute_dtype, cli/extract_features.py). Zero = no provenance. The
//     loader carries it opaquely; staleness checks happen in Python.
//   index[num_examples]:
//     u64 video_offset | u32 num_frames | u32 frame_comp_bytes[... per frame]
//       -> stored as: u64 offset, u32 num_frames, then per-frame u32 sizes
//     u32 q_len | i32 label | i32 q_id | i64 tokens[q_len]
//   data: concatenated (compressed) frames.
//
// Codec choice: this host has a single CPU core, so decode speed bounds
// end-to-end epoch throughput. zstd inflates 3-6x faster than zlib at similar
// ratios, so it is the default; zlib stays readable for old files.
//
// Build: g++ -O3 -shared -fPIC -std=c++17 vnr.cpp -o libvnr.so -lz -lzstd -lpthread

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

#include <zlib.h>
#include <zstd.h>

namespace {

constexpr uint32_t kMagic = 0x31524e56;  // 'VNR1'
constexpr int kDropEvery = 4;            // eval/utils.py:19
constexpr int kMaxFrames = 35;           // eval/utils.py:20
constexpr int kMaxQLen = 56;             // eval/utils.py:22

struct ExampleIndex {
  uint64_t offset = 0;
  uint32_t num_frames = 0;
  std::vector<uint32_t> frame_bytes;
  uint32_t q_len = 0;
  int32_t label = 0;
  int32_t q_id = 0;
  std::vector<int64_t> tokens;
};

struct VnrFile {
  FILE* f = nullptr;
  // Data section access: mmap'd by default so feature caches / datasets far
  // larger than RAM stream through the OS page cache (a full-dataset bf16
  // feature cache is TB-scale); falls back to a resident read if mmap fails.
  uint8_t* map = nullptr;  // whole-file mapping (MAP_SHARED, PROT_READ)
  size_t map_len = 0;
  std::vector<uint8_t> resident;  // fallback: data section in RAM
  uint64_t data_start = 0;
  uint16_t H = 0, W = 0, C = 0, codec = 0, code = 0;
  uint8_t fingerprint[16] = {0};  // v2 provenance hash (zero for v1 files)
  std::vector<ExampleIndex> index;
  const uint8_t* data() const {
    return map ? map + data_start : resident.data();
  }
  size_t elem() const { return code == 2 ? 2 : 1; }
  size_t frame_bytes() const {
    return static_cast<size_t>(H) * W * C * elem();
  }
};

// Decompress one stored frame into dst (frame_bytes() bytes). Returns true on
// success.
bool decode_frame(const VnrFile* vf, const uint8_t* src, uint32_t src_len,
                  uint8_t* dst) {
  const size_t want = vf->frame_bytes();
  if (vf->codec == 1) {
    uLongf dlen = want;
    return uncompress(dst, &dlen, src, src_len) == Z_OK && dlen == want;
  }
  if (vf->codec == 2) {
    size_t dlen = ZSTD_decompress(dst, want, src, src_len);
    return !ZSTD_isError(dlen) && dlen == want;
  }
  if (src_len != want) return false;
  std::memcpy(dst, src, want);
  return true;
}

template <typename T>
bool read_pod(FILE* f, T* out, size_t n = 1) {
  return fread(out, sizeof(T), n, f) == n;
}

// xorshift-based deterministic per-(seed, example, epoch) RNG so subsampling
// matches across runs and hosts.
struct XorShift {
  uint64_t s;
  explicit XorShift(uint64_t seed) : s(seed ? seed : 0x9e3779b97f4a7c15ull) {}
  uint64_t next() {
    s ^= s << 13;
    s ^= s >> 7;
    s ^= s << 17;
    return s;
  }
  // uniform int in [lo, hi] inclusive
  int uniform(int lo, int hi) {
    return lo + static_cast<int>(next() % static_cast<uint64_t>(hi - lo + 1));
  }
};

}  // namespace

extern "C" {

void* vnr_open(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  uint32_t magic = 0, version = 0, n = 0;
  uint16_t H, W, C, flags;
  if (!read_pod(f, &magic) || magic != kMagic || !read_pod(f, &version) ||
      !read_pod(f, &n) || !read_pod(f, &H) || !read_pod(f, &W) ||
      !read_pod(f, &C) || !read_pod(f, &flags)) {
    fclose(f);
    return nullptr;
  }
  auto* vf = new VnrFile();
  vf->f = f;
  vf->H = H;
  vf->W = W;
  vf->C = C;
  vf->codec = flags & 0xff;
  vf->code = flags >> 8;
  if (version >= 2 && !read_pod(f, vf->fingerprint, 16)) {
    fclose(f);
    delete vf;
    return nullptr;
  }
  vf->index.resize(n);
  for (uint32_t i = 0; i < n; ++i) {
    ExampleIndex& e = vf->index[i];
    read_pod(f, &e.offset);
    read_pod(f, &e.num_frames);
    e.frame_bytes.resize(e.num_frames);
    read_pod(f, e.frame_bytes.data(), e.num_frames);
    read_pod(f, &e.q_len);
    read_pod(f, &e.label);
    read_pod(f, &e.q_id);
    e.tokens.resize(e.q_len);
    read_pod(f, e.tokens.data(), e.q_len);
  }
  vf->data_start = static_cast<uint64_t>(ftell(f));
  fseek(f, 0, SEEK_END);
  uint64_t end = static_cast<uint64_t>(ftell(f));

  struct stat st;
  if (fstat(fileno(f), &st) == 0 && st.st_size > 0) {
    void* m = mmap(nullptr, static_cast<size_t>(st.st_size), PROT_READ,
                   MAP_SHARED, fileno(f), 0);
    if (m != MAP_FAILED) {
      vf->map = static_cast<uint8_t*>(m);
      vf->map_len = static_cast<size_t>(st.st_size);
      return vf;
    }
  }
  // fallback: resident read of the data section
  vf->resident.resize(end - vf->data_start);
  fseek(f, static_cast<long>(vf->data_start), SEEK_SET);
  if (fread(vf->resident.data(), 1, vf->resident.size(), f) !=
      vf->resident.size()) {
    fclose(f);
    delete vf;
    return nullptr;
  }
  return vf;
}

int vnr_num_examples(void* handle) {
  return static_cast<int>(static_cast<VnrFile*>(handle)->index.size());
}

// Frame geometry: out4 = {H, W, C, payload_code}.
void vnr_frame_info(void* handle, int32_t* out4) {
  auto* vf = static_cast<VnrFile*>(handle);
  out4[0] = vf->H;
  out4[1] = vf->W;
  out4[2] = vf->C;
  out4[3] = vf->code;
}

// Copies the 16-byte provenance fingerprint (all-zero for v1 files).
void vnr_fingerprint(void* handle, uint8_t* out16) {
  std::memcpy(out16, static_cast<VnrFile*>(handle)->fingerprint, 16);
}

// Decompress ALL raw frames of one example into out (caller sizes it as
// max_frames * frame_bytes). No subsampling — used by the feature-extraction
// pass, which must see every frame the random 1-of-4 pick can later select.
// Returns the number of frames written, or -1 on error.
int vnr_example_full(void* handle, int32_t idx, uint8_t* out, int max_frames) {
  auto* vf = static_cast<VnrFile*>(handle);
  if (idx < 0 || idx >= static_cast<int32_t>(vf->index.size())) return -1;
  const ExampleIndex& e = vf->index[idx];
  const size_t fb = vf->frame_bytes();
  int n = static_cast<int>(e.num_frames);
  if (n > max_frames) n = max_frames;
  uint64_t off = e.offset;
  for (int i = 0; i < n; ++i) {
    if (!decode_frame(vf, vf->data() + off, e.frame_bytes[i],
                      out + static_cast<size_t>(i) * fb))
      return -1;
    off += e.frame_bytes[i];
  }
  return n;
}

// v_len after 1-of-4 subsampling, for length-bucketed batching.
void vnr_lengths(void* handle, int32_t* out) {
  auto* vf = static_cast<VnrFile*>(handle);
  for (size_t i = 0; i < vf->index.size(); ++i) {
    int t = static_cast<int>(vf->index[i].num_frames);
    if (t > kDropEvery * kMaxFrames) t = kDropEvery * kMaxFrames;
    out[i] = (t + kDropEvery - 1) / kDropEvery;
  }
}

// Assemble one batch. out_video must hold n * t_cap * H * W * C bytes
// (t_cap <= 35 enables pre-trimmed length-bucketed batches).
// Returns 0 on success.
int vnr_batch(void* handle, const int32_t* indices, int n, int t_cap,
              uint64_t seed, int epoch, int num_threads, uint8_t* out_video,
              int32_t* out_vlen, int32_t* out_q, int32_t* out_qlen,
              int32_t* out_label, int32_t* out_qid) {
  auto* vf = static_cast<VnrFile*>(handle);
  const size_t frame_px = vf->frame_bytes();
  const size_t vid_stride = static_cast<size_t>(t_cap) * frame_px;
  std::atomic<int> cursor{0};
  std::atomic<int> status{0};

  auto worker = [&]() {
    for (;;) {
      int b = cursor.fetch_add(1);
      if (b >= n || status.load() != 0) return;
      const int32_t idx = indices[b];
      if (idx < 0 || idx >= static_cast<int32_t>(vf->index.size())) {
        status.store(2);
        return;
      }
      const ExampleIndex& e = vf->index[idx];
      uint8_t* vid_out = out_video + static_cast<size_t>(b) * vid_stride;
      std::memset(vid_out, 0, vid_stride);

      int total = static_cast<int>(e.num_frames);
      if (total > kDropEvery * kMaxFrames) total = kDropEvery * kMaxFrames;
      XorShift rng(seed * 0x100000001b3ull ^
                   (static_cast<uint64_t>(idx) << 20) ^
                   static_cast<uint64_t>(epoch));
      // per-frame offsets within this example's blob
      std::vector<uint64_t> frame_off(e.num_frames + 1);
      frame_off[0] = e.offset;
      for (uint32_t i = 0; i < e.num_frames; ++i)
        frame_off[i + 1] = frame_off[i] + e.frame_bytes[i];

      int count = 0;
      for (int i = 0; i < total && count < t_cap; i += kDropEvery) {
        int hi = (i + kDropEvery < total ? i + kDropEvery : total) - 1;
        int keep = rng.uniform(i, hi);
        const uint8_t* src = vf->data() + frame_off[keep];
        uint8_t* dst = vid_out + static_cast<size_t>(count) * frame_px;
        if (!decode_frame(vf, src, e.frame_bytes[keep], dst)) {
          status.store(3);
          return;
        }
        ++count;
      }
      out_vlen[b] = count;
      int q_len = static_cast<int>(e.q_len);
      if (q_len > kMaxQLen) q_len = kMaxQLen;
      int32_t* q_out = out_q + static_cast<size_t>(b) * kMaxQLen;
      std::memset(q_out, 0, sizeof(int32_t) * kMaxQLen);
      for (int i = 0; i < q_len; ++i)
        q_out[i] = static_cast<int32_t>(e.tokens[i]);
      out_qlen[b] = q_len;
      out_label[b] = e.label;
      out_qid[b] = e.q_id;
    }
  };

  int hw = static_cast<int>(std::thread::hardware_concurrency());
  int nt = num_threads > 0 ? num_threads : (hw > 0 ? hw : 1);
  if (nt > n) nt = n;
  std::vector<std::thread> threads;
  threads.reserve(nt);
  for (int i = 0; i < nt; ++i) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return status.load();
}

// zstd frame compression for the Python packer. Returns the compressed size,
// or -1 on error / insufficient dst capacity.
int64_t vnr_zstd_compress(const uint8_t* src, int64_t src_len, uint8_t* dst,
                          int64_t dst_cap, int level) {
  size_t n = ZSTD_compress(dst, static_cast<size_t>(dst_cap), src,
                           static_cast<size_t>(src_len), level);
  if (ZSTD_isError(n)) return -1;
  return static_cast<int64_t>(n);
}

int64_t vnr_zstd_bound(int64_t src_len) {
  return static_cast<int64_t>(ZSTD_compressBound(static_cast<size_t>(src_len)));
}

void vnr_close(void* handle) {
  auto* vf = static_cast<VnrFile*>(handle);
  if (vf->map) munmap(vf->map, vf->map_len);
  if (vf->f) fclose(vf->f);
  delete vf;
}

}  // extern "C"
