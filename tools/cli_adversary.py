"""Adversarial CLI probing matrix (judge-style): drive the real CLI over
a grid of fixtures x compress flags x extract selections and check, from
DISK, for every run:

  1. exit code 0 and no Python traceback on stderr
  2. the extracted output re-renders ALL columns via the repo's own
     readers (no dangling dictionary indices, parseable INFO)
  3. genotype columns match the (subset of the) source exactly
  4. subset outputs carry consistent AC/AN against the actual GTs
  5. -O x outputs re-extract losslessly

Runs on the host codec (XSI_DEVICE=numpy) for wall-clock; the device
path is exercised by bench.py / verify.
"""
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, "/root/repo")
from tests import fixtures  # noqa: E402

WORK = tempfile.mkdtemp(prefix="adv_")
ENV = dict(os.environ, XSI_DEVICE="numpy")
failures = []


def run(args, expect_fail=False):
    r = subprocess.run([sys.executable, "-m", "xsqueezeit_tpu.cli"] + args,
                       capture_output=True, text=True, env=ENV, timeout=300)
    label = " ".join(args)
    if "Traceback" in r.stderr:
        failures.append((label, "TRACEBACK:\n" + r.stderr[-800:]))
        return r
    if expect_fail:
        if r.returncode == 0:
            failures.append((label, "expected nonzero exit, got 0"))
        return r
    if r.returncode != 0:
        failures.append((label, f"exit {r.returncode}: {r.stderr[-400:]}"))
    return r


def vcf_body(path):
    return [l.rstrip("\n").split("\t")
            for l in open(path) if not l.startswith("#")]


def _gt_to_cells(gt, n_samples):
    """htslib gt array -> text cells (same oracle as test_extract_matrix)."""
    import numpy as np
    gt = np.asarray(gt)
    ploidy = len(gt) // n_samples
    cells = []
    for s in range(n_samples):
        parts, sep = [], "/"
        for p in range(ploidy):
            v = int(gt[s * ploidy + p])
            if v == -0x7FFFFFFF:        # vector end
                break
            if p:
                sep = "|" if (v & 1) else "/"
            allele = (v >> 1) - 1
            parts.append("." if allele < 0 else str(allele))
        cells.append(sep.join(parts) if len(parts) > 1 else parts[0])
    return cells


def render_from_disk(path):
    """Render every column of a .vcf/.bcf output via the repo readers."""
    if path.endswith(".vcf"):
        return vcf_body(path)
    from xsqueezeit_tpu.io.bcf import BcfReader
    from xsqueezeit_tpu.io.sites import render_vcf_cols
    out = []
    rd = BcfReader(path)
    n_samp = len(rd.header.samples)
    for rec in rd:
        cols = render_vcf_cols(rd.header, rec)
        g = rec.genotypes()
        cells = _gt_to_cells(g[0], n_samp)
        out.append(list(cols) + ["GT"] + list(cells))
    rd.close()
    return out


def check_ac_an(rows, label):
    """INFO AC/AN (when present) must match the GT columns."""
    for cols in rows:
        info = cols[7]
        if "AN=" not in info:
            continue
        kv = dict(p.split("=", 1) for p in info.split(";")
                  if "=" in p)
        gts = []
        for cell in cols[9:]:
            gt = cell.split(":")[0]
            for a in gt.replace("|", "/").split("/"):
                if a not in (".", ""):
                    gts.append(int(a))
        an = len(gts)
        if int(kv["AN"]) != an:
            failures.append((label, f"AN={kv['AN']} but GT says {an}"))
        if "AC" in kv:
            acs = [int(x) for x in kv["AC"].split(",")]
            n_alt = len(cols[4].split(",")) if cols[4] != "." else 0
            want = [sum(1 for g in gts if g == i + 1) for i in range(n_alt)]
            if acs != want:
                failures.append((label, f"AC={acs} but GT says {want}"))


# ----------------------------------------------------------------- fixtures
fx = {}
fx["rand"] = f"{WORK}/rand.vcf"
fixtures.random_vcf(fx["rand"], n_samples=23, n_records=100, seed=11,
                    p_multi=0.25)
fx["bare"] = f"{WORK}/bare.vcf"
fixtures.random_vcf(fx["bare"], n_samples=9, n_records=40, seed=3,
                    bare_header=True)
for name, fn in fixtures.ALL_MICRO.items():
    fx[name] = f"{WORK}/{name}.vcf"
    fn(fx[name])

CFLAGS = {
    "plain": [],
    "zstd_b3": ["--zstd", "--variant-block-length", "3"],
    "maf_hi": ["--maf", "0.4"],
    "wahmiss": ["--wah-encode-missing", "--variant-block-length", "5"],
}

n_runs = 0
for fname, vcf in fx.items():
    src = vcf_body(vcf)
    n_samp = len(src[0]) - 9
    samples = [f"S{i}" for i in range(n_samp)]
    # sample names: peek at the #CHROM line
    chrom_line = [l for l in open(vcf) if l.startswith("#CHROM")][0]
    samples = chrom_line.rstrip("\n").split("\t")[9:]
    for cname, cf in CFLAGS.items():
        if cname == "wahmiss" and fname == "bare":
            continue
        xsi = f"{WORK}/{fname}.{cname}.xsi"
        run(["-c", "-f", vcf, "-o", xsi] + cf)
        n_runs += 1
        # info dump must not crash
        run(["-i", "-f", xsi])

        # ---- full extracts across output types
        for ot, ext in (("v", ".vcf"), ("b", ".bcf"), ("u", ".ubcf"),
                        ("z", ".vcf.gz")):
            out = f"{WORK}/{fname}.{cname}.{ot}{ext}"
            run(["-x", "-f", xsi, "-o", out, "-O", ot])
            n_runs += 1
            if ot in ("v", "b", "u"):
                rows = render_from_disk(out if ot != "u" else out)
                if [r[9:] for r in rows] != [r[9:] for r in src]:
                    failures.append((f"{fname}/{cname}/-O {ot}",
                                     "GT mismatch vs source"))
                if [r[:5] for r in rows] != [r[:5] for r in src]:
                    failures.append((f"{fname}/{cname}/-O {ot}",
                                     "site cols mismatch vs source"))

        # ---- subset extracts (first 2 samples + a negation) x (v, b, x)
        if n_samp >= 3:
            sel = ",".join(samples[:2])
            neg = "^" + samples[0]
            for stag, sflag in (("s2", sel), ("neg", neg)):
                keep = ([s for s in samples[:2]] if stag == "s2"
                        else [s for s in samples if s != samples[0]])
                idx = [samples.index(s) for s in keep]
                for ot in ("v", "b"):
                    out = f"{WORK}/{fname}.{cname}.{stag}." + ("vcf" if ot == "v" else "bcf")
                    run(["-x", "-f", xsi, "-o", out, "-O", ot,
                         "-s", sflag])
                    n_runs += 1
                    rows = render_from_disk(out)
                    want = [[r[9 + i] for i in idx] for r in src]
                    got = [r[9:] for r in rows]
                    if got != want:
                        failures.append(
                            (f"{fname}/{cname}/{stag}/-O {ot}",
                             f"subset GT mismatch: {got[:1]} vs {want[:1]}"))
                    check_ac_an(rows, f"{fname}/{cname}/{stag}/-O {ot}")
                # -O x subset -> re-extract
                out = f"{WORK}/{fname}.{cname}.{stag}.x.xsi"
                run(["-x", "-f", xsi, "-o", out, "-O", "x", "-s", sflag])
                n_runs += 1
                out2 = f"{WORK}/{fname}.{cname}.{stag}.x.vcf"
                run(["-x", "-f", out, "-o", out2, "-O", "v"])
                rows = vcf_body(out2)
                want = [[r[9 + i] for i in idx] for r in src]
                if [r[9:] for r in rows] != want:
                    failures.append((f"{fname}/{cname}/{stag}/-O x",
                                     "re-extract GT mismatch"))
                check_ac_an(rows, f"{fname}/{cname}/{stag}/-O x re-extract")

        # ---- region + samples combo on one config
        if cname == "zstd_b3" and n_samp >= 3:
            out = f"{WORK}/{fname}.regsub.vcf"
            chrom = src[0][0]
            run(["-x", "-f", xsi, "-o", out, "-r", f"{chrom}:60000-60005",
                 "-s", ",".join(samples[:2])])
            n_runs += 1
            rows = vcf_body(out)
            wantp = [r for r in src if 60000 <= int(r[1]) <= 60005]
            if len(rows) != len(wantp):
                failures.append((f"{fname}/regsub",
                                 f"{len(rows)} recs vs {len(wantp)}"))
        # ---- targets
        if cname == "plain":
            pos = src[2][1] if len(src) > 2 else src[0][1]
            out = f"{WORK}/{fname}.tgt.vcf"
            chrom = src[0][0]
            run(["-x", "-f", xsi, "-o", out, "-t", f"{chrom}:{pos}"])
            n_runs += 1
            rows = vcf_body(out)
            if not rows or any(r[1] != pos for r in rows):
                failures.append((f"{fname}/tgt", f"targets wrong: {rows[:1]}"))

# ---- user-error surface: must fail with ONE LINE, no traceback
run(["-x", "-f", f"{WORK}/nope.xsi", "-o", f"{WORK}/z.vcf"],
    expect_fail=True)
run(["-c", "-f", f"{WORK}/nope.vcf", "-o", f"{WORK}/z.xsi"],
    expect_fail=True)
run(["-x", "-f", f"{WORK}/rand.plain.xsi", "-o", f"{WORK}/z.xsi",
     "-O", "x", "-r", "19:1-2"], expect_fail=True)          # empty selection
run(["-x", "-f", f"{WORK}/rand.plain.xsi", "-o", f"{WORK}/z.vcf",
     "-s", "NOT_A_SAMPLE"], expect_fail=True)
run(["-c", "-f", fx["rand"], "-o", f"{WORK}/z2.xsi",
     "--variant-block-length", "0"], expect_fail=True)

print(f"adversary: {n_runs} CLI runs")
if failures:
    for lbl, msg in failures[:20]:
        print(f"FAIL [{lbl}]: {msg}")
    sys.exit(1)
print("adversary: ALL CLEAN")
