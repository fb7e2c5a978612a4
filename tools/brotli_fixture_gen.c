/* Fixture generator for the pure-Scala RFC 7932 (Brotli) decoder.
 *
 * Dumps, via the PUBLIC API of the reference implementation
 * (libbrotlicommon/libbrotlienc 1.0.9 — the RFC's own reference code):
 *   1. the static dictionary bytes (== RFC 7932 Appendix A content),
 *   2. the word-transform table (== RFC 7932 Appendix B content) as a
 *      TSV of (prefix, type, suffix) with strings hex-encoded,
 *   3. golden decode vectors: deterministic sample inputs compressed
 *      at several (quality, lgwin) points, written as .br/.raw pairs.
 *
 * Build:  gcc -O2 -o /tmp/brotli_gen tools/brotli_fixture_gen.c \
 *             -lbrotlienc -lbrotlidec -lbrotlicommon
 * Run:    /tmp/brotli_gen <repo-root>
 *
 * This tool runs ONCE at fixture-authoring time; nothing links against
 * libbrotli at build or run time — the Scala decoder consumes only the
 * checked-in bytes.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <stdint.h>
#include <stddef.h>

#include <brotli/encode.h>

/* common/dictionary.h + common/transform.h structs (public headers of
 * the reference implementation; not installed by the -dev package, so
 * the leading fields are declared here verbatim). */
typedef struct BrotliDictionary {
  uint8_t size_bits_by_length[32];
  uint32_t offsets_by_length[32];
  size_t data_size;
  const uint8_t* data;
} BrotliDictionary;
extern const BrotliDictionary* BrotliGetDictionary(void);

typedef struct BrotliTransforms {
  uint16_t prefix_suffix_size;
  const uint8_t* prefix_suffix;
  const uint16_t* prefix_suffix_map;
  uint32_t num_transforms;
  const uint8_t* transforms; /* triples: prefix_id, type, suffix_id */
} BrotliTransformsHead;
extern const BrotliTransformsHead* BrotliGetTransforms(void);

static void write_file(const char* path, const uint8_t* b, size_t n) {
  FILE* f = fopen(path, "wb");
  if (!f) { perror(path); exit(1); }
  if (n && fwrite(b, 1, n, f) != n) { perror(path); exit(1); }
  fclose(f);
}

static void hex(FILE* f, const uint8_t* b, size_t n) {
  for (size_t i = 0; i < n; i++) fprintf(f, "%02x", b[i]);
}

static uint8_t* gen_input(int kind, size_t* out_n) {
  /* deterministic sample inputs — no RNG, reproducible forever */
  size_t cap = 1 << 20;
  uint8_t* b = malloc(cap);
  size_t n = 0;
  switch (kind) {
    case 0: /* empty */
      break;
    case 1: /* single byte */
      b[n++] = 'x';
      break;
    case 2: { /* dictionary-word-rich small ASCII text */
      const char* s =
        "The time of the day is the time of the world. People said that "
        "government and development of information should work together, "
        "because the first time you download the program, the public "
        "description of the system will not be available. Time after "
        "time, the different groups within the national community were "
        "really different.";
      n = strlen(s); memcpy(b, s, n);
      break;
    }
    case 3: { /* repetitive text, ~64 KiB: backward references */
      const char* unit = "abcabcabd-pattern 0123456789 the quick brown "
        "fox jumps over the lazy dog; ";
      size_t u = strlen(unit);
      while (n + u + 16 < (1 << 16)) {
        memcpy(b + n, unit, u); n += u;
        n += sprintf((char*)b + n, "#%zu ", n);
      }
      break;
    }
    case 4: { /* binary: LCG bytes, mostly incompressible */
      uint32_t x = 123456789u;
      for (n = 0; n < 65536; n++) {
        x = x * 1664525u + 1013904223u;
        b[n] = (uint8_t)(x >> 24);
      }
      break;
    }
    case 5: { /* UTF-8 text with capitals (UTF8 context mode, ferment
                 transforms), ~200 KiB */
      const char* unit = "Die Zeit läuft — время идёт. Le Monde est à "
        "nous! Ελληνικά και 中文 mixed With Capitalized Words Here. ";
      size_t u = strlen(unit);
      size_t i = 0;
      while (n + u < (200 << 10)) {
        memcpy(b + n, unit, u); n += u;
        if (++i % 7 == 0) n += sprintf((char*)b + n, "%zu\n", i);
      }
      break;
    }
    case 6: { /* structured: alternating text and binary runs (block
                 switching, context-map pressure) */
      uint32_t x = 99u;
      while (n < (96 << 10)) {
        n += sprintf((char*)b + n,
          "record=%u field=alpha value=%u; ", (unsigned)(n & 1023),
          (unsigned)x);
        for (int j = 0; j < 24; j++) {
          x = x * 22695477u + 1u;
          b[n++] = (uint8_t)(x >> 23);
        }
      }
      break;
    }
    default: n = 0;
  }
  *out_n = n;
  return b;
}

int main(int argc, char** argv) {
  if (argc != 2) { fprintf(stderr, "usage: %s <repo-root>\n", argv[0]); return 1; }
  char path[4096];
  const char* root = argv[1];

  /* 1. dictionary */
  const BrotliDictionary* d = BrotliGetDictionary();
  printf("dictionary: %zu bytes\n", d->data_size);
  snprintf(path, sizeof path, "%s/src/main/resources/graft/brotli/dictionary.bin", root);
  write_file(path, d->data, d->data_size);
  printf("size_bits_by_length:");
  for (int i = 0; i < 32; i++) printf(" %u", d->size_bits_by_length[i]);
  printf("\noffsets_by_length:");
  for (int i = 0; i < 32; i++) printf(" %u", d->offsets_by_length[i]);
  printf("\n");

  /* 2. transforms */
  const BrotliTransformsHead* t = BrotliGetTransforms();
  printf("transforms: %u\n", t->num_transforms);
  snprintf(path, sizeof path, "%s/src/main/resources/graft/brotli/transforms.tsv", root);
  FILE* tf = fopen(path, "w");
  for (uint32_t i = 0; i < t->num_transforms; i++) {
    uint8_t pid = t->transforms[3 * i];
    uint8_t typ = t->transforms[3 * i + 1];
    uint8_t sid = t->transforms[3 * i + 2];
    /* prefix_suffix segments are LENGTH-PREFIXED (first byte = len) */
    const uint8_t* p = &t->prefix_suffix[t->prefix_suffix_map[pid]];
    const uint8_t* s = &t->prefix_suffix[t->prefix_suffix_map[sid]];
    hex(tf, p + 1, p[0]);
    fprintf(tf, "\t%u\t", typ);
    hex(tf, s + 1, s[0]);
    fprintf(tf, "\n");
  }
  fclose(tf);

  /* 2b. the literal-context lookup table (RFC 7932 §7.1's published
   * tables, all four modes: lut0 at mode*512, lut1 at mode*512+256) */
  {
    extern const uint8_t _kBrotliContextLookupTable[2048];
    snprintf(path, sizeof path, "%s/src/main/resources/graft/brotli/context.bin", root);
    write_file(path, _kBrotliContextLookupTable, 2048);
    printf("context table written\n");
  }

  /* 3. golden vectors */
  const int qualities[] = {0, 1, 5, 9, 11};
  const int wins[] = {10, 18, 22, 24};
  for (int kind = 0; kind <= 6; kind++) {
    size_t n; uint8_t* in = gen_input(kind, &n);
    snprintf(path, sizeof path, "%s/src/test/resources/brotli/vectors/in%d.raw", root, kind);
    write_file(path, in, n);
    for (unsigned qi = 0; qi < sizeof qualities / sizeof *qualities; qi++)
      for (unsigned wi = 0; wi < sizeof wins / sizeof *wins; wi++) {
        int q = qualities[qi], w = wins[wi];
        /* keep the matrix small: full quality sweep only at lgwin=18;
           other windows at q=5 and q=11 */
        if (w != 18 && q != 5 && q != 11) continue;
        size_t enc_cap = BrotliEncoderMaxCompressedSize(n) + 64;
        uint8_t* enc = malloc(enc_cap);
        size_t enc_n = enc_cap;
        if (!BrotliEncoderCompress(q, w, BROTLI_MODE_GENERIC, n, in,
                                   &enc_n, enc)) {
          fprintf(stderr, "encode failed kind=%d q=%d w=%d\n", kind, q, w);
          return 1;
        }
        snprintf(path, sizeof path,
          "%s/src/test/resources/brotli/vectors/in%d_q%d_w%d.br", root, kind, q, w);
        write_file(path, enc, enc_n);
        free(enc);
      }
    free(in);
  }
  printf("vectors written\n");
  return 0;
}
