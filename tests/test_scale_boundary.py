"""Scale-boundary coverage: H > 65535 (beyond the 16-bit packing limits).

The chunked PBWT kernels pack haplotype positions into 16-bit fields of u32
sort keys, so H > 65535 takes dedicated fallbacks: pbwt_encode_scan /
pbwt_decode_blocked on device, uint32 A_T everywhere (reference context:
HRC has 64976 haplotypes, README.md:32-34; the reference's own A_T selection
is inconsistent for 32769-65535 samples, SURVEY.md "latent reference bug" --
here A_T keys on N_HAPS).  Round-1 review: these paths existed but nothing
exercised them end to end above the boundary.
"""
import numpy as np
import pytest

H_BIG = 65544          # just over the u16 field limit
N_SAMPLES_BIG = H_BIG // 2


def _random_block(rng, L, H, p=0.3):
    return (rng.random((L, H)) < p).astype(np.int8)


def test_pbwt_encode_scan_above_u16_vs_numpy():
    import jax.numpy as jnp
    from xsqueezeit_tpu.ops import pbwt_jax, pbwt_np

    rng = np.random.default_rng(21)
    L = 12
    x = _random_block(rng, L, H_BIG)
    sorts = np.ones(L, bool)
    sorts[3] = sorts[7] = False
    a0 = np.arange(H_BIG, dtype=np.int32)

    got_y, got_a = pbwt_jax.pbwt_encode_scan(
        jnp.asarray(x), jnp.asarray(np.ones(L, np.int32)),
        jnp.asarray(sorts), jnp.asarray(a0))

    a = np.arange(H_BIG)
    for l in range(L):
        y = x[l][a]
        np.testing.assert_array_equal(np.asarray(got_y[l]), y,
                                      err_msg=f"line {l}")
        if sorts[l]:
            a = pbwt_np.pbwt_sort_bool(a, y)
    np.testing.assert_array_equal(np.asarray(got_a), a)


def test_pbwt_decode_blocked_above_u16_roundtrip():
    import jax.numpy as jnp
    from xsqueezeit_tpu.ops import pbwt_jax

    rng = np.random.default_rng(22)
    L = 12
    x = _random_block(rng, L, H_BIG)
    sorts = np.ones(L, bool)
    sorts[5] = False
    a0 = np.arange(H_BIG, dtype=np.int32)
    ys, a_enc = pbwt_jax.pbwt_encode_scan(
        jnp.asarray(x), jnp.asarray(np.ones(L, np.int32)),
        jnp.asarray(sorts), jnp.asarray(a0))
    vals, a_dec = pbwt_jax.pbwt_decode_blocked(
        jnp.asarray(np.asarray(ys)), jnp.asarray(sorts))
    np.testing.assert_array_equal(np.asarray(vals), (x == 1))
    np.testing.assert_array_equal(np.asarray(a_dec), np.asarray(a_enc))


@pytest.fixture(scope="module")
def big_block():
    """A small block of records over 65544 haplotypes with a rare/common
    mix (sparse + WAH + negated-sparse lines)."""
    rng = np.random.default_rng(23)
    L = 10
    freqs = np.array([0.00003, 0.4, 0.00006, 0.9, 0.0, 0.25, 0.99997,
                      0.00004, 0.6, 0.00002])
    alleles = (rng.random((L, H_BIG)) < freqs[:, None]).astype(np.int8)
    gt = ((alleles.astype(np.int32) + 1) << 1)
    return alleles, gt


def test_device_encoder_u32_matches_numpy_above_u16(big_block):
    """The device encoder's H > 65535 branch (encoder_jax: pbwt_encode_scan
    + u32 sparse sort compaction) must produce byte-identical payloads to
    the NumPy encoder."""
    from xsqueezeit_tpu.codec.encoder_jax import DeviceBlockEncoder
    from xsqueezeit_tpu.codec.gt_block import GtBlockEncoder

    alleles, gt = big_block
    mac_threshold = 4  # > sparse counts of the rare lines
    kw = dict(n_samples=N_SAMPLES_BIG, block_bcf_lines=16,
              mac_threshold=mac_threshold, default_phasing=0,
              aet_dtype=np.uint32)
    enc_np = GtBlockEncoder(**kw)
    enc_dev = DeviceBlockEncoder(**kw)
    for row in gt:
        enc_np.encode_record(row, 2)
        enc_dev.encode_record(row, 2)
    payload_np = enc_np.serialize()
    payload_dev = enc_dev.serialize()
    assert payload_np == payload_dev


def test_device_decoder_u32_above_u16(big_block):
    from xsqueezeit_tpu.codec.decoder_jax import (
        DeviceBlockDecoder,
        decode_block_records,
    )
    from xsqueezeit_tpu.codec.gt_block import GtBlockEncoder

    alleles, gt = big_block
    enc = GtBlockEncoder(n_samples=N_SAMPLES_BIG, block_bcf_lines=16,
                         mac_threshold=4, default_phasing=0,
                         aet_dtype=np.uint32)
    for row in gt:
        enc.encode_record(row, 2)
    payload = enc.serialize()

    dev = DeviceBlockDecoder(payload, N_SAMPLES_BIG, H_BIG, np.uint32)
    assert dev.eligible
    got = decode_block_records(payload, N_SAMPLES_BIG, H_BIG, np.uint32,
                               [2] * gt.shape[0])
    np.testing.assert_array_equal(np.stack(got), gt)


def test_e2e_roundtrip_33k_samples(tmp_path):
    """CLI round trip with 32780 samples (65560 haps): aet=u32 end to end."""
    from xsqueezeit_tpu.cli import main as cli_main
    from xsqueezeit_tpu.format.container import XsiReader
    from xsqueezeit_tpu.io.unified import GtInput

    n_samples = 32780
    rng = np.random.default_rng(24)
    L = 6
    freqs = [0.00005, 0.3, 0.0, 0.99996, 0.00003, 0.7]
    alleles = np.stack([(rng.random(2 * n_samples) < f).astype(np.int8)
                        for f in freqs])
    vcf = tmp_path / "big.vcf"
    with open(vcf, "w") as f:
        f.write("##fileformat=VCFv4.2\n"
                '##FORMAT=<ID=GT,Number=1,Type=String,Description="G">\n'
                "##contig=<ID=20,length=63025520>\n")
        f.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
                + "\t".join(f"S{i}" for i in range(n_samples)) + "\n")
        for i in range(L):
            cells = "\t".join(
                f"{alleles[i, 2*s]}|{alleles[i, 2*s+1]}"
                for s in range(n_samples))
            f.write(f"20\t{60000+i}\t.\tG\tA\t.\tPASS\t.\tGT\t{cells}\n")
    xsi = str(tmp_path / "big.xsi")
    out = str(tmp_path / "big.out.vcf")
    assert cli_main(["-c", "-f", str(vcf), "-o", xsi, "--maf", "0.0001"]) == 0
    assert XsiReader(xsi).header.aet_bytes == 4  # u32 A_T keyed on N_HAPS
    assert cli_main(["-x", "-f", xsi, "-o", out]) == 0
    inp = GtInput(out)
    got = np.stack([rec.gt for rec in inp])
    inp.close()
    # phased input: the phase bit marks the SECOND allele slot only
    # (htslib convention; the first slot's bit stays 0)
    want = (((alleles.astype(np.int32) + 1) << 1)
            | (np.arange(2 * n_samples) & 1)[None, :])
    np.testing.assert_array_equal(got, want)
