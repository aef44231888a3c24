/*
 * Standalone ASan/UBSan soak for the native entropy codec: encodes random
 * amplitude planes with the in-file encoder, decodes them through every
 * batch path (block-major lanes, packed i8 lanes, coefficient-major), and
 * byte-compares against the scalar plane decoder — all compiled with
 * -fsanitize=address,undefined so the SIMD staging/flush machinery is
 * bounds- and UB-checked (ctypes cannot load an ASan'd .so into Python,
 * hence this C harness).  Also throws corrupted copies at every path:
 * outputs are unspecified there, but reads/writes must stay in bounds.
 *
 * Build & run (scripts/sanitize_native.sh or):
 *   gcc -O1 -g -std=c11 -fwrapv -march=native -fopenmp \
 *       -fsanitize=address,undefined -fno-sanitize-recover=all \
 *       -o /tmp/san_native scripts/sanitize_native.c && /tmp/san_native
 */
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "../mjpeg423_tpu/native/centropy.c"

static uint64_t rs = 0x9E3779B97F4A7C15ull;
static uint64_t rnd(void) {
  rs ^= rs << 13;
  rs ^= rs >> 7;
  rs ^= rs << 17;
  return rs;
}

int main(void) {
  enum { MAX_NB = 300, N_ITEMS = 21, TRIALS = 60 };
  int16_t* amps = malloc((size_t)N_ITEMS * MAX_NB * 64 * sizeof(int16_t));
  uint8_t* enc = malloc((size_t)N_ITEMS * MAX_NB * 64 * 3 + 64 * N_ITEMS);
  uint64_t off[N_ITEMS], len[N_ITEMS];
  uint8_t isp[N_ITEMS];
  int16_t* out = malloc((size_t)N_ITEMS * MAX_NB * 64 * sizeof(int16_t));
  int16_t* ref = malloc((size_t)MAX_NB * 64 * sizeof(int16_t));
  int16_t* dc = malloc((size_t)N_ITEMS * MAX_NB * sizeof(int16_t));
  int8_t* ac = malloc((size_t)N_ITEMS * MAX_NB * 64);
  int16_t* cm = malloc((size_t)N_ITEMS * MAX_NB * 64 * sizeof(int16_t));
  if (!amps || !enc || !out || !ref || !dc || !ac || !cm) return 2;

  for (int t = 0; t < TRIALS; t++) {
    int nb = 1 + (int)(rnd() % MAX_NB);
    int dense = (int)(rnd() % 100);
    size_t pos = 0;
    for (int i = 0; i < N_ITEMS; i++) {
      isp[i] = (uint8_t)(rnd() & 1);
      int16_t* a = amps + (size_t)i * nb * 64;
      memset(a, 0, (size_t)nb * 64 * sizeof(int16_t));
      for (int b = 0; b < nb; b++)
        for (int k = 0; k < 64; k++)
          if ((int)(rnd() % 100) < dense)
            a[b * 64 + k] = (int16_t)((int)(rnd() % 4095) - 2047);
      int n = mj423_encode_plane(a, nb, enc + pos,
                                 (size_t)nb * 64 * 3 + 64);
      if (n < 0) { fprintf(stderr, "encode overflow\n"); return 1; }
      off[i] = pos;
      len[i] = (uint64_t)n;
      pos += (size_t)n;
    }
    /* valid streams: every path must equal the scalar decoder */
    int rc = mj423_decode_batch(enc, off, len, isp, N_ITEMS, nb, out);
    if (rc != 0) { fprintf(stderr, "batch rc=%d\n", rc); return 1; }
    for (int i = 0; i < N_ITEMS; i++) {
      int rp = mj423_decode_plane(enc + off[i], (size_t)len[i], nb, isp[i],
                                  ref);
      if (rp != 0 ||
          memcmp(ref, out + (size_t)i * nb * 64,
                 (size_t)nb * 64 * sizeof(int16_t)) != 0) {
        fprintf(stderr, "trial %d item %d: bm mismatch\n", t, i);
        return 1;
      }
    }
    int rc8 = mj423_decode_batch_i8(enc, off, len, isp, N_ITEMS, nb, dc, ac);
    if (rc8 == 0) {
      for (int i = 0; i < N_ITEMS; i++) {
        const int16_t* o = out + (size_t)i * nb * 64;
        for (int b = 0; b < nb; b++) {
          if (dc[(size_t)i * nb + b] != o[b * 64]) {
            fprintf(stderr, "trial %d: i8 dc mismatch\n", t);
            return 1;
          }
          for (int k = 1; k < 64; k++)
            if (ac[((size_t)i * nb + b) * 64 + k] != (int8_t)o[b * 64 + k]) {
              fprintf(stderr, "trial %d: i8 ac mismatch\n", t);
              return 1;
            }
        }
      }
    } else if (rc8 < 0) {
      fprintf(stderr, "trial %d: i8 rc=%d on valid streams\n", t, rc8);
      return 1;
    } /* rc8 == +1: legal overflow fallback for |amp| > 127 content */
    if (nb % 4 == 0) {
      int rcm = mj423_decode_batch_cm(enc, off, len, isp, N_ITEMS, nb,
                                      nb / 4, cm);
      if (rcm != 0) { fprintf(stderr, "cm rc=%d\n", rcm); return 1; }
    }
    /* corrupted copies: outputs unspecified, memory accesses must not be */
    for (int i = 0; i < N_ITEMS; i++) {
      if (len[i] > 8 && (rnd() & 1)) {
        size_t j = off[i] + rnd() % len[i];
        enc[j] ^= (uint8_t)(1u << (rnd() % 8));
      }
      if (rnd() % 4 == 0) len[i] = 8 + rnd() % (len[i] - 7);
    }
    (void)mj423_decode_batch(enc, off, len, isp, N_ITEMS, nb, out);
    (void)mj423_decode_batch_i8(enc, off, len, isp, N_ITEMS, nb, dc, ac);
    if (nb % 4 == 0)
      (void)mj423_decode_batch_cm(enc, off, len, isp, N_ITEMS, nb, nb / 4,
                                  cm);
    if (t % 10 == 0) fprintf(stderr, "trial %d ok (nb=%d)\n", t, nb);
  }
  free(amps);
  free(enc);
  free(out);
  free(ref);
  free(dc);
  free(ac);
  free(cm);
  printf("SANITIZER SOAK CLEAN\n");
  return 0;
}
