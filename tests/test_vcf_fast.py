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
