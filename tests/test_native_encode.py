"""Native GT block encoder (native/gt_encoder.cpp) vs the Python oracle.

The host -c hot loop in C++ (counterpart of the native extract loop):
payloads must be byte-identical to codec/gt_block.py GtBlockEncoder for
every record class, strategy, index width and phasing default, and the
whole-pipeline containers must match across XSI_NATIVE_ENCODE=0/1.
"""
import os

import numpy as np
import pytest

from xsqueezeit_tpu.codec.gt_block import GtBlockEncoder
from xsqueezeit_tpu.codec.gt_block_decoder import GtBlockDecoder
from xsqueezeit_tpu.format.constants import WeirdnessStrategy
from tests.gt_synth import make_record

native = pytest.importorskip("xsqueezeit_tpu.interop.native")


def both(records, n_samples, **kw):
    py = GtBlockEncoder(n_samples, **kw)
    nt = native.NativeBlockEncoder(n_samples, **kw)
    for gt, na in records:
        py.encode_record(gt, na)
        nt.encode_record(gt, na)
    a, b = py.serialize(), nt.serialize()
    assert a == b, f"payloads differ: {len(a)} vs {len(b)} bytes"
    return a


def kitchen_sink(rng, n):
    records = []
    for i in range(n):
        if i % 7 == 0:
            records.append(make_record(rng, 64, p_alt=0.5, haploid=True))
        elif i % 5 == 0:
            records.append(make_record(rng, 64, n_alts=3, p_alt=0.4,
                                       p_missing=0.03, p_phase_flip=0.05))
        elif i % 3 == 0:
            records.append(make_record(rng, 64, p_alt=0.002))
        else:
            records.append(make_record(rng, 64, p_alt=0.3, p_missing=0.02,
                                       p_eov=0.04, p_phase_flip=0.02))
    return records


@pytest.mark.parametrize("ws", [WeirdnessStrategy.WS_SPARSE,
                                WeirdnessStrategy.WS_WAH,
                                WeirdnessStrategy.WS_PBWT_WAH])
@pytest.mark.parametrize("aet", [np.uint16, np.uint32])
def test_native_encoder_matrix(ws, aet):
    rng = np.random.default_rng(hash((int(ws), np.dtype(aet).num)) % 2**31)
    records = kitchen_sink(rng, 48)
    payload = both(records, 64, block_bcf_lines=10_000, mac_threshold=2,
                   default_phasing=1, aet_dtype=aet, weirdness_strategy=ws)
    if ws != WeirdnessStrategy.WS_PBWT_WAH:
        dec = GtBlockDecoder(payload, 64, 128, aet_dtype=aet)
        pos = 0
        for gt, na in records:
            dec.seek(pos)
            np.testing.assert_array_equal(
                dec.fill_genotype_array_advance(na), gt)
            pos += na - 1


def test_native_encoder_long_runs_and_saturation():
    """> 16383-word fills exercise the WAH counter-saturation path."""
    n = 20000  # 40000 haps -> 2667 words per line
    gt0 = np.full(2 * n, 2, np.int32)
    gt0[1::2] |= 1
    gt1 = gt0.copy()
    gt1[2:12000] |= 2  # long one-fill + long zero-fill
    kw = dict(block_bcf_lines=100, mac_threshold=1, default_phasing=1,
              aet_dtype=np.uint32,
              weirdness_strategy=WeirdnessStrategy.WS_SPARSE)
    both([(gt0, 2), (gt1, 2), (gt1, 2)], n, **kw)


def test_native_encoder_zero_alt_and_errors():
    kw = dict(block_bcf_lines=10, mac_threshold=1, default_phasing=1,
              aet_dtype=np.uint16,
              weirdness_strategy=WeirdnessStrategy.WS_SPARSE)
    clean = np.full(12, 2, np.int32)
    clean[1::2] |= 1
    both([(clean, 1)], 6, **kw)  # clean zero-ALT round trip

    nt = native.NativeBlockEncoder(6, **kw)
    bad = clean.copy()
    bad[0] = 0  # missing on a zero-ALT record
    with pytest.raises(ValueError, match="no ALT allele"):
        nt.encode_record(bad, 1)

    nt2 = native.NativeBlockEncoder(6, **kw)
    with pytest.raises(ValueError, match="Ploidy higher than 2"):
        nt2.encode_record(np.zeros(18, np.int32), 2)


def test_native_encoder_unphased_default():
    rng = np.random.default_rng(9)
    records = [make_record(rng, 50, p_alt=0.3, phased=False)
               for _ in range(12)]
    both(records, 50, block_bcf_lines=100, mac_threshold=1,
         default_phasing=0, aet_dtype=np.uint16,
         weirdness_strategy=WeirdnessStrategy.WS_SPARSE)


def test_compress_containers_identical_across_encoders(tmp_path):
    import hashlib

    from xsqueezeit_tpu.bench.e2e import synth_bcf
    from xsqueezeit_tpu.codec.compressor import (
        CompressorOptions,
        compress_file,
    )

    inp = str(tmp_path / "in.bcf")
    synth_bcf(inp, 500, 83)
    sums = {}
    for mode in ("0", "1"):
        os.environ["XSI_NATIVE_ENCODE"] = mode
        try:
            sub = tmp_path / ("m" + mode)
            sub.mkdir()
            out = str(sub / "o.xsi")
            compress_file(inp, out, CompressorOptions(block_length=128,
                                                      device="numpy"))
            sums[mode] = tuple(
                hashlib.sha256(open(out + s, "rb").read()).hexdigest()
                for s in ("", "_var.bcf", "_var.bcf.csi"))
        finally:
            os.environ.pop("XSI_NATIVE_ENCODE", None)
    assert sums["0"] == sums["1"]


def test_native_variant_pass_matches_python(tmp_path, monkeypatch):
    """variant_pass_native (var_pass.cpp): var.bcf records, CSI voffset
    validity (region seek) and the .xsi must all match the Python pass."""
    import hashlib

    from xsqueezeit_tpu.bench.e2e import synth_bcf
    from xsqueezeit_tpu.cli import main as cli
    from xsqueezeit_tpu.codec.compressor import (
        CompressorOptions,
        compress_file,
    )
    from xsqueezeit_tpu.io.bcf import BcfReader

    inp = str(tmp_path / "in.bcf")
    synth_bcf(inp, 1200, 60)
    monkeypatch.delenv("XSI_DEVICE", raising=False)
    for mode, sub in (("0", "py"), ("1", "nt")):
        monkeypatch.setenv("XSI_NATIVE", mode)
        d = tmp_path / sub
        d.mkdir()
        compress_file(inp, str(d / "o.xsi"),
                      CompressorOptions(block_length=128, device="numpy"))

    def var_recs(p):
        r = BcfReader(p)
        out = [(bytes(rec.shared), bytes(rec.indiv)) for rec in r]
        r.close()
        return out

    a = var_recs(str(tmp_path / "py" / "o.xsi_var.bcf"))
    b = var_recs(str(tmp_path / "nt" / "o.xsi_var.bcf"))
    assert a == b and len(a) == 1200
    ha = hashlib.sha256(open(tmp_path / "py" / "o.xsi", "rb").read())
    hb = hashlib.sha256(open(tmp_path / "nt" / "o.xsi", "rb").read())
    assert ha.digest() == hb.digest()

    # region seek through the NATIVE-written CSI
    monkeypatch.setenv("XSI_NATIVE", "1")
    assert cli(["-x", "-f", str(tmp_path / "nt" / "o.xsi"),
                "-o", str(tmp_path / "reg.bcf"), "-O", "b",
                "-r", "20:62000-64000"]) == 0
    monkeypatch.setenv("XSI_NATIVE", "0")
    monkeypatch.setenv("XSI_DEVICE", "numpy")
    assert cli(["-x", "-f", str(tmp_path / "py" / "o.xsi"),
                "-o", str(tmp_path / "reg2.bcf"), "-O", "b",
                "-r", "20:62000-64000"]) == 0
    ra = var_recs(str(tmp_path / "reg.bcf"))
    rb = var_recs(str(tmp_path / "reg2.bcf"))
    assert ra == rb and len(ra) > 0


def test_batched_gt_loop_byte_identical(tmp_path, monkeypatch):
    """The batched GT main loop (GtInput.iter_gt_batches + segment blocks
    + xsi_enc_records) must produce byte-identical containers to the
    per-record loop on a kitchen-sink input: mixed ploidy, multi-allelic,
    missing, EOV, non-uniform phasing, blocks that split parse batches
    and batches that span blocks."""
    import hashlib

    from xsqueezeit_tpu.codec.compressor import (
        CompressorOptions,
        compress_file,
    )
    from xsqueezeit_tpu.io.bcf import BcfHeader, BcfWriter
    from xsqueezeit_tpu.io.sites import (
        encode_gt_indiv,
        encode_shared_from_vcf_cols,
    )
    from xsqueezeit_tpu.io.unified import GtInput
    from tests.gt_synth import make_record

    rng = np.random.default_rng(99)
    ns = 61
    h = BcfHeader.from_text(
        "##fileformat=VCFv4.2\n"
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">\n'
        "##contig=<ID=20,length=63025520>\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
        + "\t".join(f"S{i}" for i in range(ns)))
    inp = str(tmp_path / "ks.bcf")
    w = BcfWriter(inp, h)
    pos = 60000
    for i in range(700):
        if i % 11 == 0:
            gt, na = make_record(rng, ns, haploid=True, p_alt=0.4)
        elif i % 7 == 0:
            gt, na = make_record(rng, ns, n_alts=3, p_alt=0.3,
                                 p_missing=0.05, p_phase_flip=0.1)
        elif i % 3 == 0:
            gt, na = make_record(rng, ns, p_alt=0.004)
        else:
            gt, na = make_record(rng, ns, p_alt=0.35, p_missing=0.02,
                                 p_eov=0.03)
        alt = ",".join("ACGT"[j % 4] for j in range(1, na))
        shared = encode_shared_from_vcf_cols(
            h, ["20", str(pos), f"rs{i}", "G", alt, ".", "PASS", "."],
            n_fmt=1, n_sample=ns)
        ploidy = 1 if gt.shape[0] == ns else 2
        w.write_raw(shared, encode_gt_indiv(h, gt, ploidy, ns))
        pos += 13
    w.close()

    monkeypatch.delenv("XSI_DEVICE", raising=False)
    sums = {}
    real = GtInput.iter_gt_batches
    # block_length 96 forces batches (1024) to span many blocks; a second
    # config with block_length 512 covers blocks larger than the tail
    for bl in (96, 512):
        for mode in ("batched", "perrec"):
            monkeypatch.setattr(
                GtInput, "iter_gt_batches",
                real if mode == "batched" else (lambda self: None))
            d = tmp_path / f"{mode}{bl}"
            d.mkdir()
            # same basename: the _var.bcf header embeds ##XSI=<basename>
            out = str(d / "o.xsi")
            compress_file(inp, out, CompressorOptions(block_length=bl,
                                                      device="numpy"))
            sums[(mode, bl)] = tuple(
                hashlib.sha256(open(out + s, "rb").read()).hexdigest()
                for s in ("", "_var.bcf", "_var.bcf.csi"))
        assert sums[("batched", bl)] == sums[("perrec", bl)], bl

    # round trip sanity on the batched container
    from xsqueezeit_tpu.codec.decompressor import (
        Decompressor,
        DecompressorOptions,
    )
    back = str(tmp_path / "back.bcf")
    monkeypatch.setenv("XSI_DEVICE", "numpy")
    Decompressor(str(tmp_path / "batched96" / "o.xsi"),
                 DecompressorOptions(output_type="b")).decompress(back)
    monkeypatch.delenv("XSI_DEVICE", raising=False)
    a, b = GtInput(inp), GtInput(back)
    for i, (ra, rb) in enumerate(zip(a, b)):
        np.testing.assert_array_equal(ra.gt, rb.gt, err_msg=f"record {i}")
    a.close()
    b.close()


def test_batched_gt_loop_no_gt_record_raises(tmp_path, monkeypatch):
    """A record without usable GT data must fail the batched loop with the
    same error as the per-record loop."""
    from xsqueezeit_tpu.codec.compressor import (
        CompressorOptions,
        compress_file,
    )
    from xsqueezeit_tpu.io.bcf import BcfHeader, BcfWriter
    from xsqueezeit_tpu.io.sites import (
        encode_gt_indiv,
        encode_shared_from_vcf_cols,
    )
    from tests.gt_synth import make_record

    rng = np.random.default_rng(3)
    ns = 7
    h = BcfHeader.from_text(
        "##fileformat=VCFv4.2\n"
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">\n'
        "##contig=<ID=20,length=63025520>\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
        + "\t".join(f"S{i}" for i in range(ns)))
    inp = str(tmp_path / "nogt.bcf")
    w = BcfWriter(inp, h)
    for i in range(3):
        gt, na = make_record(rng, ns, p_alt=0.3)
        shared = encode_shared_from_vcf_cols(
            h, ["20", str(60000 + i), f"rs{i}", "G", "A", ".", "PASS", "."],
            n_fmt=1 if i != 1 else 0, n_sample=ns)
        # record 1 carries no FORMAT fields at all
        w.write_raw(shared, b"" if i == 1
                    else encode_gt_indiv(h, gt, 2, ns))
    w.close()
    monkeypatch.delenv("XSI_DEVICE", raising=False)
    with pytest.raises(ValueError, match="without GT data"):
        compress_file(inp, str(tmp_path / "o.xsi"),
                      CompressorOptions(device="numpy"))
