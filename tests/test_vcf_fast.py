"""Fast vectorized VCF GT parse vs the general per-cell parser."""
import numpy as np

from xsqueezeit_tpu.io.vcf import VcfReader, _fast_diploid_gt


def _write(path, body_lines, n_samples):
    names = "\t".join(f"S{i}" for i in range(n_samples))
    with open(path, "w") as f:
        f.write("##fileformat=VCFv4.2\n")
        f.write('##FORMAT=<ID=GT,Number=1,Type=String,Description="G">\n')
        f.write("##contig=<ID=20>\n")
        f.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
                + names + "\n")
        for l in body_lines:
            f.write(l + "\n")


def test_fast_path_equals_fallback(tmp_path):
    rows = [
        "0|1\t1/0\t.|.\t9|9",        # fast: phases, missing, max digit
        "0|1\t1|0\t0|0\t1|1",
        "./.\t0/0\t1/1\t.|1",
    ]
    for region in rows:
        fast = _fast_diploid_gt(region, 4)
        assert fast is not None
        p = str(tmp_path / "a.vcf")
        _write(p, [f"20\t100\t.\tG\tA\t.\tPASS\t.\tGT\t{region}"], 4)
        r = VcfReader(p)
        rec = next(iter(r))
        r.close()
        np.testing.assert_array_equal(fast, rec.gt)


def test_fallback_cases(tmp_path):
    # multi-digit allele, haploid cell, extra FORMAT subfield: must fall back
    cases = [
        ("GT", "10|1\t0|0"),            # two-digit allele
        ("GT", "0\t0|0"),               # haploid first cell
        ("GT:DP", "0|1:3\t1|1:9"),      # extra subfield
    ]
    for fmt, region in cases:
        assert _fast_diploid_gt(region, 2) is None or fmt != "GT"
        p = str(tmp_path / "b.vcf")
        alt = "A,C,G,T,AA,CC,GG,TT,AT,CG" if "10" in region else "A"
        _write(p, [f"20\t100\t.\tG\t{alt}\t.\tPASS\t.\t{fmt}\t{region}"], 2)
        r = VcfReader(p)
        rec = next(iter(r))
        r.close()
        assert rec.gt is not None
        if "10" in region:
            assert rec.gt.tolist() == [(10 + 1) << 1, ((1 + 1) << 1) | 1,
                                       (0 + 1) << 1, ((0 + 1) << 1) | 1]


def test_native_gt_region_renderer_matches_oracle():
    """xsi_format_gt_region (native -O v hot spot) must render exactly
    what the Python format_gt oracle renders, for every value class."""
    import pytest

    from xsqueezeit_tpu.format.constants import INT32_VECTOR_END
    from xsqueezeit_tpu.io.vcf import format_gt

    native = pytest.importorskip("xsqueezeit_tpu.interop.native")
    fn = native.format_gt_region_native

    rng = np.random.default_rng(17)
    enc = lambda allele, phase: ((allele + 1) << 1) | phase

    cases = []
    # random diploid with missing/phases/multi-allelic incl. >9 alleles
    for trial in range(30):
        ns = int(rng.integers(1, 40))
        alleles = rng.integers(-1, 13, ns * 2)
        phases = rng.integers(0, 2, ns * 2)
        gt = np.array([enc(a, p) for a, p in zip(alleles, phases)],
                      np.int32)
        cases.append((gt, 2, ns))
    # haploid
    gt = np.array([enc(a, 0) for a in rng.integers(-1, 3, 23)], np.int32)
    cases.append((gt, 1, 23))
    # EOV-truncated second alleles and a fully-EOV sample
    gt = np.array([enc(1, 0), INT32_VECTOR_END,
                   INT32_VECTOR_END, INT32_VECTOR_END,
                   enc(0, 1), enc(2, 1)], np.int32)
    cases.append((gt, 2, 3))
    # huge allele indices exercise the multi-digit writer
    gt = np.array([enc(123456, 0), enc(0, 1)], np.int32)
    cases.append((gt, 2, 1))
    # zero samples
    cases.append((np.zeros(0, np.int32), 2, 0))

    for gt, ploidy, ns in cases:
        oracle = "\t".join(format_gt(gt, ploidy, ns))
        got = fn(gt, ploidy, ns)
        assert got == oracle, (gt.tolist(), ploidy, ns)


def test_format_gt_region_gate(monkeypatch):
    """format_gt_region_bytes must pin the Python renderer under explicit
    XSI_DEVICE / XSI_NATIVE=0 (test-suite convention) and agree with the
    native renderer when the gate is open."""
    from xsqueezeit_tpu.io.vcf import format_gt_region_bytes

    gt = np.array([4, 5, 2, 2, 6, 7], np.int32)  # 1|1 0/0 2|2
    monkeypatch.setenv("XSI_DEVICE", "numpy")
    py = format_gt_region_bytes(gt, 2, 3)
    monkeypatch.delenv("XSI_DEVICE", raising=False)
    monkeypatch.setenv("XSI_NATIVE", "1")
    nat = format_gt_region_bytes(gt, 2, 3)
    assert py == nat == b"1|1\t0/0\t2|2"
