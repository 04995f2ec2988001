// Golden-stream dumper: drives the UNMODIFIED reference headers (included
// read-only from /root/reference, never copied into this repo) to emit the
// exact bitstreams of the reference's plain and 2-way-interleaved encoders,
// so tests can byte-compare them against this framework's output.
//
// Usage: dump_reference <variant> <n_lanes> <infile> <outfile>
//   variant: byte | word | rans64 | alias
//   n_lanes: 1 | 2
//
// Output file layout: [u64 payload_size][payload bytes...]
// The payload is states+stream only (the reference keeps the frequency table
// and input size out-of-band in program variables, SURVEY.md "what the
// reference is NOT").
//
// Model setup (count/normalize, prob_bits per demo) mirrors the reference
// demo drivers by calling into this repo's semantics via the same integer
// math; the SymbolStats struct here is re-declared from the demo .cpp files
// because those live outside the includable headers.  It is test scaffolding
// only, not part of the framework.

#include <assert.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include <string>
#include <vector>

#include "platform.h"    // via -I /root/reference (ALIGNSPEC for the SIMD header)
#include "rans_byte.h"
#include "rans64.h"
#include "rans_word_sse41.h"

// The alias machinery (SymbolStats + make_alias_table + RansEncPutAlias)
// lives only inside the demo main_alias.cpp, not a header; include the
// UNMODIFIED demo with its main() renamed so its encoder drives the golden
// dump too (file stays read-only in /root/reference, never copied).
#define main alias_demo_main_unused
#include "main_alias.cpp"
#undef main

// -- order-0 model with the demos' exact integer semantics
// (main.cpp:49-129; re-stated here, not copied: histogram, truncating
// rescale, steal-from-smallest fixup)
struct Model {
  uint32_t freqs[256];
  uint64_t cum[257];

  void build(const uint8_t* in, size_t n, uint32_t target) {
    memset(freqs, 0, sizeof(freqs));
    for (size_t i = 0; i < n; i++) freqs[in[i]]++;
    cum[0] = 0;
    for (int i = 0; i < 256; i++) cum[i + 1] = cum[i] + freqs[i];
    uint64_t cur_total = cum[256];
    for (int i = 1; i <= 256; i++)
      cum[i] = (uint64_t)target * cum[i] / cur_total;
    for (int i = 0; i < 256; i++) {
      if (freqs[i] && cum[i + 1] == cum[i]) {
        uint64_t best_freq = ~0ull;
        int best = -1;
        for (int j = 0; j < 256; j++) {
          uint64_t f = cum[j + 1] - cum[j];
          if (f > 1 && f < best_freq) { best_freq = f; best = j; }
        }
        assert(best != -1);
        if (best < i)
          for (int j = best + 1; j <= i; j++) cum[j]--;
        else
          for (int j = i + 1; j <= best; j++) cum[j]++;
      }
    }
    assert(cum[0] == 0 && cum[256] == target);
    for (int i = 0; i < 256; i++) freqs[i] = (uint32_t)(cum[i + 1] - cum[i]);
  }
};

static std::vector<uint8_t> read_all(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) { fprintf(stderr, "cannot open %s\n", path); exit(1); }
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(n);
  if (n && fread(buf.data(), 1, n, f) != (size_t)n) exit(1);
  fclose(f);
  return buf;
}

static void write_payload(const char* path, const uint8_t* p, size_t n) {
  FILE* f = fopen(path, "wb");
  if (!f) { fprintf(stderr, "cannot open %s\n", path); exit(1); }
  uint64_t sz = n;
  fwrite(&sz, sizeof(sz), 1, f);
  fwrite(p, 1, n, f);
  fclose(f);
}

int main(int argc, char** argv) {
  if (argc != 5) { fprintf(stderr, "usage: %s variant lanes in out\n", argv[0]); return 2; }
  std::string variant = argv[1];
  int lanes = atoi(argv[2]);
  std::vector<uint8_t> in = read_all(argv[3]);
  size_t in_size = in.size();

  std::vector<uint8_t> out(32u << 20);

  if (variant == "byte") {
    const uint32_t prob_bits = 14;  // main.cpp:136
    Model m; m.build(in.data(), in_size, 1u << prob_bits);
    RansEncSymbol esyms[256];
    for (int i = 0; i < 256; i++)
      RansEncSymbolInit(&esyms[i], (uint32_t)m.cum[i], m.freqs[i], prob_bits);
    uint8_t* ptr = out.data() + out.size();
    if (lanes == 1) {  // main.cpp:173-181
      RansState r; RansEncInit(&r);
      for (size_t i = in_size; i > 0; i--)
        RansEncPutSymbol(&r, &ptr, &esyms[in[i - 1]]);
      RansEncFlush(&r, &ptr);
    } else {           // main.cpp:226-245
      RansState r0, r1; RansEncInit(&r0); RansEncInit(&r1);
      if (in_size & 1) RansEncPutSymbol(&r0, &ptr, &esyms[in[in_size - 1]]);
      for (size_t i = (in_size & ~(size_t)1); i > 0; i -= 2) {
        RansEncPutSymbol(&r1, &ptr, &esyms[in[i - 1]]);
        RansEncPutSymbol(&r0, &ptr, &esyms[in[i - 2]]);
      }
      RansEncFlush(&r1, &ptr);
      RansEncFlush(&r0, &ptr);
    }
    write_payload(argv[4], ptr, out.data() + out.size() - ptr);
  } else if (variant == "rans64") {
    const uint32_t prob_bits = 14;  // main64.cpp:136
    Model m; m.build(in.data(), in_size, 1u << prob_bits);
    Rans64EncSymbol esyms[256];
    for (int i = 0; i < 256; i++)
      Rans64EncSymbolInit(&esyms[i], (uint32_t)m.cum[i], m.freqs[i], prob_bits);
    uint32_t* end = (uint32_t*)(out.data() + out.size());
    uint32_t* ptr = end;
    if (lanes == 1) {  // main64.cpp:175-183
      Rans64State r; Rans64EncInit(&r);
      for (size_t i = in_size; i > 0; i--)
        Rans64EncPutSymbol(&r, &ptr, &esyms[in[i - 1]], prob_bits);
      Rans64EncFlush(&r, &ptr);
    } else {           // main64.cpp:228-247
      Rans64State r0, r1; Rans64EncInit(&r0); Rans64EncInit(&r1);
      if (in_size & 1) Rans64EncPutSymbol(&r0, &ptr, &esyms[in[in_size - 1]], prob_bits);
      for (size_t i = (in_size & ~(size_t)1); i > 0; i -= 2) {
        Rans64EncPutSymbol(&r1, &ptr, &esyms[in[i - 1]], prob_bits);
        Rans64EncPutSymbol(&r0, &ptr, &esyms[in[i - 2]], prob_bits);
      }
      Rans64EncFlush(&r1, &ptr);
      Rans64EncFlush(&r0, &ptr);
    }
    write_payload(argv[4], (uint8_t*)ptr, (uint8_t*)end - (uint8_t*)ptr);
  } else if (variant == "word") {
    // scale fixed at RANS_WORD_SCALE_BITS=12 (rans_word_sse41.h:37);
    // N-way layout: symbol i -> state i & (N-1), flush descending
    // (main_simd.cpp:160-167 scalar, :225-233 2-way, :293-299 8-way).
    Model m; m.build(in.data(), in_size, RANS_WORD_M);
    uint32_t cum32[256];
    for (int i = 0; i < 256; i++) cum32[i] = (uint32_t)m.cum[i];
    uint16_t* end = (uint16_t*)(out.data() + out.size());
    uint16_t* ptr = end;
    std::vector<RansWordEnc> r(lanes);
    for (int l = 0; l < lanes; l++) r[l] = RansWordEncInit();
    for (size_t i = in_size; i > 0; i--) {
      int s = in[i - 1];
      RansWordEncPut(&r[(i - 1) & (lanes - 1)], &ptr, cum32[s], m.freqs[s]);
    }
    for (int l = lanes; l > 0; l--) RansWordEncFlush(&r[l - 1], &ptr);
    write_payload(argv[4], (uint8_t*)ptr, (uint8_t*)end - (uint8_t*)ptr);
  } else if (variant == "alias") {
    const uint32_t prob_bits = 16;  // main_alias.cpp:276
    SymbolStats stats;
    stats.count_freqs(in.data(), in_size);
    stats.normalize_freqs(1u << prob_bits);
    stats.make_alias_table();
    uint8_t* ptr = out.data() + out.size();
    if (lanes == 1) {  // main_alias.cpp:289-297
      RansState r; RansEncInit(&r);
      for (size_t i = in_size; i > 0; i--)
        RansEncPutAlias(&r, &ptr, &stats, in[i - 1], prob_bits);
      RansEncFlush(&r, &ptr);
    } else {           // main_alias.cpp:348-365 (2-way interleave)
      RansState r0, r1; RansEncInit(&r0); RansEncInit(&r1);
      if (in_size & 1)
        RansEncPutAlias(&r0, &ptr, &stats, in[in_size - 1], prob_bits);
      for (size_t i = (in_size & ~(size_t)1); i > 0; i -= 2) {
        RansEncPutAlias(&r1, &ptr, &stats, in[i - 1], prob_bits);
        RansEncPutAlias(&r0, &ptr, &stats, in[i - 2], prob_bits);
      }
      RansEncFlush(&r1, &ptr);
      RansEncFlush(&r0, &ptr);
    }
    write_payload(argv[4], ptr, out.data() + out.size() - ptr);
  } else {
    fprintf(stderr, "unsupported variant %s\n", variant.c_str());
    return 2;
  }
  return 0;
}
