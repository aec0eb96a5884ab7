/* hostops.c — native host-side runtime kernels (ctypes).
 *
 * The device compute path is JAX/XLA/Pallas; these are the host-side
 * hot loops that feed it: Elias-gamma offset expansion for the
 * compressed k-mer index (the equivalent of the reference's gamma
 * decode, genome_hr.h:22-29, needed when opening databases built with
 * basesize < kmer) and 2-bit FASTQ batch encoding.
 *
 * Build: cc -O3 -shared -fPIC -o libhostops.so hostops.c
 */

#include <stdint.h>
#include <stddef.h>

/* Expand blocked Elias-gamma offsets (see indexdb.py write_offsets_gamma
 * for the bit layout) into a flat uint32 array of length n_oligos + 1.
 * Returns 0 on success. */
int
gamma_expand_offsets(const uint32_t *gammaptrs, const uint32_t *comp,
                     uint32_t *out, uint64_t n_oligos, uint32_t blocksize)
{
    uint64_t oligok = 0;
    uint64_t nblocks = n_oligos / blocksize;
    for (uint64_t b = 0; b < nblocks; b++) {
        uint64_t ptr = gammaptrs[b];
        uint32_t cum = comp[ptr++];
        out[oligok++] = cum;
        uint32_t word = comp[ptr];
        int bit = 0;  /* bits consumed from MSB of current word */
        for (uint32_t j = 1; j < blocksize; j++) {
            int zeros = 0;
            while (((word >> (31 - bit)) & 1u) == 0u) {
                zeros++;
                if (++bit == 32) { word = comp[++ptr]; bit = 0; }
            }
            uint32_t value = 0;
            for (int t = 0; t <= zeros; t++) {
                value = (value << 1) | ((word >> (31 - bit)) & 1u);
                if (++bit == 32) { ptr++; word = comp[ptr]; bit = 0; }
            }
            cum += value - 1u;
            out[oligok++] = cum;
        }
    }
    out[oligok] = comp[gammaptrs[nblocks]];
    return 0;
}

/* Write blocked Elias-gamma offsets (Indexdb_write_offsets,
 * indexdb.c:1979-2039 bit layout; mirrors indexdb.py
 * write_offsets_gamma exactly).  gammaptrs: nblocks+1 entries; words:
 * caller-allocated worst case (per block 1 + ceil((blocksize-1)*65/32)
 * + 1 slack, + 1 final total).  Returns the word count written. */
int64_t
gamma_write_offsets(const uint32_t *offsets, uint64_t n_oligos,
                    uint32_t blocksize, uint32_t *gammaptrs,
                    uint32_t *words)
{
    uint64_t nblocks = n_oligos / blocksize;
    int64_t w = 0;
    for (uint64_t b = 0; b < nblocks; b++) {
        uint64_t blk = b * blocksize;
        gammaptrs[b] = (uint32_t) w;
        words[w++] = offsets[blk];
        uint64_t buffer = 0;
        int ctr = 32;
        for (uint32_t j = 1; j < blocksize; j++) {
            uint64_t gamma =
                (uint64_t) (offsets[blk + j] - offsets[blk + j - 1]) + 1u;
            int nbits = 0;
            for (uint64_t g = gamma; g > 1; g >>= 1) nbits++;
            int length = 2 * nbits + 1;
            while (length > ctr) {
                if (length - ctr < 32)
                    buffer |= gamma >> (length - ctr);
                words[w++] = (uint32_t) (buffer & 0xFFFFFFFFu);
                length -= ctr;
                ctr = 32;
                buffer = 0;
            }
            buffer |= (gamma << (ctr - length)) & 0xFFFFFFFFu;
            ctr -= length;
        }
        words[w++] = (uint32_t) (buffer & 0xFFFFFFFFu);
    }
    gammaptrs[nblocks] = (uint32_t) w;
    words[w++] = offsets[n_oligos];
    return w;
}

/* Encode ASCII nucleotides into 2-bit codes + N flags for a padded read
 * batch: seqs is the concatenation of reads; out arrays are B*lmax. */
void
encode_reads(const char *seqs, const int32_t *lengths, int64_t nreads,
             int64_t lmax, uint8_t *codes, uint8_t *nflags)
{
    int64_t src = 0;
    for (int64_t r = 0; r < nreads; r++) {
        int32_t len = lengths[r];
        for (int32_t i = 0; i < len; i++) {
            char c = seqs[src + i];
            uint8_t code = 0, flag = 0;
            switch (c) {
            case 'A': case 'a': code = 0; break;
            case 'C': case 'c': code = 1; break;
            case 'G': case 'g': code = 2; break;
            case 'T': case 't': case 'U': case 'u': code = 3; break;
            default: code = 0; flag = 1; break;
            }
            codes[r * lmax + i] = code;
            nflags[r * lmax + i] = flag;
        }
        for (int64_t i = len; i < lmax; i++) {
            codes[r * lmax + i] = 0;
            nflags[r * lmax + i] = 1;
        }
        src += len;
    }
}
