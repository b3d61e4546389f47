/*
 * hts_shim/synced_bcf_reader.h — htslib synced-reader subset (no htslib).
 *
 * Implements the bcf_sr_* surface that c_xcf_* consumers use
 * (/root/reference/c_api_test/main.c, lockstep_loader): N readers over
 * position-sorted VCF/BCF files advanced in lockstep; bcf_sr_next_line
 * moves to the next (rid, pos) present in ANY reader and returns how many
 * readers carry it; bcf_sr_get_line yields reader i's record or NULL.
 */
#ifndef HTS_SHIM_SYNCED_BCF_READER_H
#define HTS_SHIM_SYNCED_BCF_READER_H

#include "vcf.h"

typedef struct bcf_sr_t {
    bcf_hdr_t *header;
    void *impl;
} bcf_sr_t;

typedef struct bcf_srs_t {
    int nreaders;
    bcf_sr_t *readers;
    void *impl;
} bcf_srs_t;

#ifdef __cplusplus
extern "C" {
#endif

bcf_srs_t *bcf_sr_init(void);
/* Returns 1 on success, 0 on failure (htslib convention). */
int bcf_sr_add_reader(bcf_srs_t *sr, const char *fname);
/* Advance to the next position; returns the number of readers set. */
int bcf_sr_next_line(bcf_srs_t *sr);
bcf1_t *hts_shim_sr_get_line(bcf_srs_t *sr, int i);
#define bcf_sr_get_line(sr_, i_) hts_shim_sr_get_line((sr_), (i_))
/* Nonzero if reader i has a record at the current position. */
int bcf_sr_has_line(bcf_srs_t *sr, int i);
void bcf_sr_destroy(bcf_srs_t *sr);
/* The path reader i was opened with. */
const char *hts_shim_reader_fname(bcf_srs_t *sr, int i);

#ifdef __cplusplus
}
#endif

#endif /* HTS_SHIM_SYNCED_BCF_READER_H */
