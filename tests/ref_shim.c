/* Black-box test shim around the READ-ONLY reference library
 * (/root/reference/include): builds/probes reference filters so pytest
 * can differential-test our implementation against the real thing.
 * Compiled on demand by tests/test_reference_parity.py with
 * -I/root/reference/include; contains no reference code itself.
 *
 * usage:
 *   ref_shim <kind> build    <keys.bin> <filter.out>  # serialized filter
 *   ref_shim <kind> contain  <filter.bin> <keys.bin>  # 1 byte per key
 *   ref_shim <kind> seed     <keys.bin>               # winning seed (hex)
 *   ref_shim <kind> pack     <keys.bin> <packed.out>  # PACKED filter
 *   ref_shim <kind> containp <packed.bin> <keys.bin>  # unpack + contain
 * kinds: xor8 xor16 fuse8 fuse16 ; keys.bin = little-endian u64 array.
 */
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "xorfilter.h"
#include "binaryfusefilter.h"

static uint64_t *read_u64(const char *path, size_t *n) {
    FILE *f = fopen(path, "rb");
    if (!f) { perror(path); exit(2); }
    fseek(f, 0, SEEK_END);
    long sz = ftell(f);
    fseek(f, 0, SEEK_SET);
    uint64_t *buf = malloc(sz);
    if (fread(buf, 1, sz, f) != (size_t)sz) exit(2);
    fclose(f);
    *n = sz / 8;
    return buf;
}

static void write_all(const char *path, const void *buf, size_t n) {
    FILE *f = strcmp(path, "-") ? fopen(path, "wb") : stdout;
    fwrite(buf, 1, n, f);
    if (f != stdout) fclose(f);
}

#define RUN(KIND, TYPE)                                                      \
    do {                                                                     \
        if (!strcmp(mode, "build") || !strcmp(mode, "seed")) {               \
            size_t n; uint64_t *keys = read_u64(argv[3], &n);                \
            TYPE##_t f;                                                      \
            if (!TYPE##_allocate((uint32_t)n, &f)) exit(3);                  \
            if (!TYPE##_populate(keys, (uint32_t)n, &f)) exit(4);            \
            if (!strcmp(mode, "seed")) {                                     \
                printf("%016llx\n", (unsigned long long)SEED_OF(f));         \
            } else {                                                         \
                size_t sz = TYPE##_serialization_bytes(&f);                  \
                char *out = malloc(sz);                                      \
                TYPE##_serialize(&f, out);                                   \
                write_all(argv[4], out, sz);                                 \
            }                                                                \
            exit(0);                                                         \
        }                                                                    \
        if (!strcmp(mode, "pack")) {                                         \
            size_t n; uint64_t *keys = read_u64(argv[3], &n);                \
            TYPE##_t f;                                                      \
            if (!TYPE##_allocate((uint32_t)n, &f)) exit(3);                  \
            if (!TYPE##_populate(keys, (uint32_t)n, &f)) exit(4);            \
            size_t sz = TYPE##_pack_bytes(&f);                               \
            char *out = malloc(sz);                                          \
            size_t used = TYPE##_pack(&f, out, sz);                          \
            if (!used) exit(6);                                              \
            write_all(argv[4], out, used);                                   \
            exit(0);                                                         \
        }                                                                    \
        if (!strcmp(mode, "contain") || !strcmp(mode, "containp")) {         \
            FILE *ff = fopen(argv[3], "rb");                                 \
            fseek(ff, 0, SEEK_END); long fsz = ftell(ff);                    \
            fseek(ff, 0, SEEK_SET);                                          \
            char *fbuf = malloc(fsz);                                        \
            if (fread(fbuf, 1, fsz, ff) != (size_t)fsz) exit(2);             \
            fclose(ff);                                                      \
            TYPE##_t f;                                                      \
            if (!strcmp(mode, "containp")) {                                 \
                if (!TYPE##_unpack(&f, fbuf, (size_t)fsz)) exit(5);          \
            } else {                                                         \
                if (!TYPE##_deserialize(&f, fbuf)) exit(5);                  \
            }                                                                \
            size_t n; uint64_t *keys = read_u64(argv[4], &n);                \
            unsigned char *out = malloc(n);                                  \
            for (size_t i = 0; i < n; i++)                                   \
                out[i] = TYPE##_contain(keys[i], &f);                        \
            write_all("-", out, n);                                          \
            exit(0);                                                         \
        }                                                                    \
    } while (0)

int main(int argc, char **argv) {
    if (argc < 4) { fprintf(stderr, "bad args\n"); return 1; }
    const char *kind = argv[1], *mode = argv[2];
#define SEED_OF(f) ((f).seed)
    if (!strcmp(kind, "xor8")) RUN(xor8, xor8);
    if (!strcmp(kind, "xor16")) RUN(xor16, xor16);
#undef SEED_OF
#define SEED_OF(f) ((f).Seed)
    if (!strcmp(kind, "fuse8")) RUN(fuse8, binary_fuse8);
    if (!strcmp(kind, "fuse16")) RUN(fuse16, binary_fuse16);
#undef SEED_OF
    fprintf(stderr, "unknown kind %s\n", kind);
    return 1;
}
