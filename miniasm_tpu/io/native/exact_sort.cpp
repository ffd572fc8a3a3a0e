// Exact-permutation radix argsort (see ../../utils/exact_sort.py for the
// contract).  Re-implements the behavior of the reference's
// KRADIX_SORT_INIT (ksort.h:134-183) — MSD 8-bit digits, cycle-leader
// in-place distribution, stable insertion sort below 64 elements — over
// (u64 key, i64 index) pairs so the exact row permutation, including the
// order of equal keys, can be applied to SoA columns.

#include <cstdint>
#include <cstring>

namespace {

struct KV {
    uint64_t key;
    int64_t idx;
};

constexpr int64_t kMinSize = 64;

inline void insert_sort(KV* beg, KV* end) {
    for (KV* i = beg + 1; i < end; ++i) {
        if (i->key < (i - 1)->key) {
            KV tmp = *i;
            KV* j = i;
            for (; j > beg && tmp.key < (j - 1)->key; --j) *j = *(j - 1);
            *j = tmp;
        }
    }
}

struct Bucket {
    KV* b;
    KV* e;
};

void rs_sort(KV* beg, KV* end, int n_bits, int s) {
    const int size = 1 << n_bits, m = size - 1;
    Bucket b[256];
    Bucket* be = b + size;
    for (Bucket* k = b; k != be; ++k) k->b = k->e = beg;
    for (KV* i = beg; i != end; ++i) ++b[i->key >> s & m].e;
    for (Bucket* k = b + 1; k != be; ++k) {
        k->e += (k - 1)->e - beg;
        k->b = (k - 1)->e;
    }
    for (Bucket* k = b; k != be;) {
        if (k->b != k->e) {
            Bucket* l = b + (k->b->key >> s & m);
            if (l != k) {
                KV tmp = *k->b, swap;
                do {
                    swap = tmp;
                    tmp = *l->b;
                    *l->b++ = swap;
                    l = b + (tmp.key >> s & m);
                } while (l != k);
                *k->b++ = tmp;
            } else {
                ++k->b;
            }
        } else {
            ++k;
        }
    }
    b->b = beg;
    for (Bucket* k = b + 1; k != be; ++k) k->b = (k - 1)->e;
    if (s) {
        s = s > n_bits ? s - n_bits : 0;
        for (Bucket* k = b; k != be; ++k) {
            if (k->e - k->b > kMinSize)
                rs_sort(k->b, k->e, n_bits, s);
            else if (k->e - k->b > 1)
                insert_sort(k->b, k->e);
        }
    }
}

}  // namespace

extern "C" void ma_radix_argsort_u64(uint64_t* keys, int64_t* idx, int64_t n) {
    KV* a = new KV[n];
    for (int64_t i = 0; i < n; ++i) a[i] = {keys[i], idx[i]};
    if (n <= kMinSize)
        insert_sort(a, a + n);
    else
        rs_sort(a, a + n, 8, 56);
    for (int64_t i = 0; i < n; ++i) {
        keys[i] = a[i].key;
        idx[i] = a[i].idx;
    }
    delete[] a;
}
