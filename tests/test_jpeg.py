"""Baseline JPEG codec conformance (operators/jpeg.py).

Layered so a failure localizes: DCT matrix vs the T.81 double-sum
definition, Huffman canonical code construction vs spec examples,
entropy roundtrip identity on raw coefficient blocks, whole-codec
roundtrips (exact for block-aligned flat content at quality 75, PSNR
bounds for smooth content, dimension exactness for odd sizes), router
sniffing, unsupported-format gates, and a pillow cross-check that
SKIPS when pillow is absent (this container) but pins interop where it
exists.
"""

import numpy as np
import pytest

from tse_spark.operators import jpeg
from tse_spark.operators import multimodal as mm


# ------------------------------------------------------------ DCT layer


def test_dct_matrix_is_orthonormal():
    a = jpeg._A
    assert np.allclose(a @ a.T, np.eye(8), atol=1e-12)


def test_fdct_matches_t81_double_sum():
    rng = np.random.RandomState(0)
    blk = rng.randint(0, 256, (8, 8)).astype(np.float64) - 128.0

    def direct(b):
        out = np.zeros((8, 8))
        for v in range(8):
            for u in range(8):
                s = 0.0
                for y in range(8):
                    for x in range(8):
                        s += (
                            b[y, x]
                            * np.cos((2 * x + 1) * u * np.pi / 16)
                            * np.cos((2 * y + 1) * v * np.pi / 16)
                        )
                cu = 1 / np.sqrt(2) if u == 0 else 1.0
                cv = 1 / np.sqrt(2) if v == 0 else 1.0
                out[v, u] = 0.25 * cu * cv * s
        return out

    assert np.allclose(jpeg._A @ blk @ jpeg._A.T, direct(blk), atol=1e-9)


def test_quality_tables_match_ijg_law():
    lum75, chr75 = jpeg.quality_tables(75)
    assert lum75[0, 0] == 8  # floor((16*50+50)/100) — the oracle anchor
    assert chr75[0, 0] == 9
    lum50, _ = jpeg.quality_tables(50)
    assert (lum50 == jpeg.Q_LUM).all()
    lum100, _ = jpeg.quality_tables(100)
    assert (lum100 == 1).all()
    lum1, _ = jpeg.quality_tables(1)
    assert lum1.max() <= 255 and lum1.min() >= 1


# -------------------------------------------------------- huffman layer


def test_canonical_huffman_dc_lum_first_codes():
    codes = jpeg._build_codes(jpeg.DC_LUM_BITS, jpeg.DC_LUM_VALS)
    # canonical: category 0 -> 00 (2 bits), 1 -> 010, ... per Annex K
    assert codes[0] == (0b00, 2)
    assert codes[1] == (0b010, 3)
    assert codes[2] == (0b011, 3)
    assert codes[5] == (0b110, 3)
    assert codes[6] == (0b1110, 4)
    assert codes[11] == (0b111111110, 9)


def test_huffman_encode_decode_identity_on_blocks():
    rng = np.random.RandomState(1)
    dc_codes = jpeg._build_codes(jpeg.DC_LUM_BITS, jpeg.DC_LUM_VALS)
    ac_codes = jpeg._build_codes(jpeg.AC_LUM_BITS, jpeg.AC_LUM_VALS)
    dc_tab = jpeg._build_decode(jpeg.DC_LUM_BITS, jpeg.DC_LUM_VALS)
    ac_tab = jpeg._build_decode(jpeg.AC_LUM_BITS, jpeg.AC_LUM_VALS)
    blocks = []
    for _ in range(50):
        zz = np.zeros(64, dtype=np.int64)
        nz = rng.randint(0, 20)
        pos = rng.choice(64, size=nz, replace=False)
        zz[pos] = rng.randint(-255, 256, size=nz)
        blocks.append(zz)
    w = jpeg._BitWriter()
    pred = 0
    for zz in blocks:
        pred = jpeg._encode_block(w, zz, pred, dc_codes, ac_codes)
    data = w.flush() + b"\xff\xd9"
    br = jpeg._BitReader(data, 0)
    dc_lut = jpeg._build_lut(dc_tab)
    ac_lut = jpeg._build_lut(ac_tab)
    pred = 0
    for zz in blocks:
        got, pred = jpeg._decode_block(br, pred, dc_lut, ac_lut)
        assert (got == zz).all()


def test_byte_stuffing_roundtrip():
    # force 0xFF bytes in the stream and make sure the reader unstuffs
    w = jpeg._BitWriter()
    w.write(0xFF, 8)
    w.write(0xFF, 8)
    w.write(0b1010, 4)
    data = w.flush()
    assert data.count(b"\xff\x00") == 2
    br = jpeg._BitReader(data + b"\xff\xd9", 0)
    assert br.bits(8) == 0xFF
    assert br.bits(8) == 0xFF
    assert br.bits(4) == 0b1010


# ---------------------------------------------------------- whole codec


def test_flat_gray_exact_at_q75():
    for v in (0, 7, 128, 200, 255):
        img = np.full((13, 21), v, dtype=np.uint8)
        out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=75))
        assert out.shape == (13, 21)
        assert (out == v).all()


def test_piecewise_flat_block_aligned_exact():
    img = np.full((11, 32), 40, dtype=np.uint8)
    img[:, 16:] = 200
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=75))
    assert (out == img).all()


def test_flat_halves_fixture_law_exact():
    for i in (0, 1, 5, 17, 123, 399):
        img = mm._jpeg_flat_halves(i)
        out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=75))
        assert (out == img).all()


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255.0**2 / mse) if mse else np.inf


def test_smooth_gray_roundtrip_psnr():
    yy, xx = np.mgrid[0:64, 0:96]
    img = (128 + 60 * np.sin(xx / 15.0) * np.cos(yy / 11.0)).astype(
        np.uint8
    )
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=90))
    assert out.shape == img.shape
    assert _psnr(out, img) > 40


def test_color_roundtrip_444_and_420():
    yy, xx = np.mgrid[0:48, 0:40]
    img = np.zeros((48, 40, 3), np.uint8)
    img[..., 0] = (128 + 50 * np.sin(xx / 9.0)).astype(np.uint8)
    img[..., 1] = (128 + 50 * np.cos(yy / 7.0)).astype(np.uint8)
    img[..., 2] = 90
    for sub, floor in (("444", 40), ("420", 32)):
        out = jpeg.decode_jpeg(
            jpeg.encode_jpeg(img, quality=90, subsampling=sub)
        )
        assert out.shape == img.shape
        assert _psnr(out, img) > floor


def test_odd_dimensions_crop_exact():
    rng = np.random.RandomState(3)
    for shape in ((1, 1), (7, 9), (17, 23), (8, 8), (16, 24)):
        img = rng.randint(0, 256, shape).astype(np.uint8)
        out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=50))
        assert out.shape == shape
    img3 = rng.randint(0, 256, (9, 13, 3)).astype(np.uint8)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(img3, quality=50))
    assert out.shape == (9, 13, 3)


def test_high_quality_noise_close():
    rng = np.random.RandomState(4)
    img = rng.randint(0, 256, (24, 24)).astype(np.uint8)
    out = jpeg.decode_jpeg(jpeg.encode_jpeg(img, quality=100))
    # q100 quantizers are all 1: error is DCT float rounding only
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1


# ------------------------------------------------------- router + gates


def test_stdlib_router_sniffs_jpeg():
    img = np.full((8, 8), 77, dtype=np.uint8)
    data = jpeg.encode_jpeg(img, quality=75)
    assert data[:3] == b"\xff\xd8\xff"
    out = mm.decode_image_stdlib(data)
    assert (out == 77).all()


def test_progressive_rejected_with_pillow_hint():
    img = np.full((8, 8), 10, dtype=np.uint8)
    data = bytearray(jpeg.encode_jpeg(img, quality=75))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC2  # flip SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="pillow"):
        jpeg.decode_jpeg(bytes(data))


def test_not_a_jpeg_rejected():
    with pytest.raises(ValueError, match="SOI"):
        jpeg.decode_jpeg(b"\x89PNG\r\n")


def test_truncated_stream_raises():
    img = np.full((16, 16), 90, dtype=np.uint8)
    data = jpeg.encode_jpeg(img, quality=75)
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(data[: len(data) // 2])


# ----------------------------------------------------- pillow interop


def _pil_or_skip():
    try:
        from PIL import Image  # type: ignore[import-not-found]

        return Image
    except ImportError:
        pytest.skip("pillow not installed in this container")


def test_pillow_decodes_our_output():
    Image = _pil_or_skip()
    import io

    yy, xx = np.mgrid[0:32, 0:48]
    img = (128 + 40 * np.sin(xx / 7.0 + yy / 5.0)).astype(np.uint8)
    data = jpeg.encode_jpeg(img, quality=90)
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("L"))
    assert pil.shape == img.shape
    assert _psnr(pil, img) > 38


def test_we_decode_pillow_output():
    Image = _pil_or_skip()
    import io

    yy, xx = np.mgrid[0:32, 0:48]
    img = (128 + 40 * np.cos(xx / 6.0) * np.sin(yy / 9.0)).astype(
        np.uint8
    )
    buf = io.BytesIO()
    Image.fromarray(img, mode="L").save(buf, format="JPEG", quality=90)
    out = jpeg.decode_jpeg(buf.getvalue())
    assert out.shape == img.shape
    assert _psnr(out, img) > 38


# ------------------------------------------------------ spark fixtures


def test_jpeg_media_df_features_match_law(spark):
    out = (
        mm.decode_image_features(
            mm.jpeg_media_df(spark, 30), decode_backend="stdlib"
        )
        .orderBy("media_id")
        .collect()
    )
    assert len(out) == 30
    for r in out:
        i = r["media_id"]
        img = mm._jpeg_flat_halves(i)
        assert (r["width"], r["height"]) == (img.shape[1], img.shape[0])
        assert r["mean_px"] == pytest.approx(img.mean(), abs=1e-9)
        assert r["std_px"] == pytest.approx(img.std(), abs=1e-9)


def test_mixed_media_df_router_all_formats(spark):
    out = (
        mm.decode_image_features(
            mm.mixed_media_df(spark, 12), decode_backend="stdlib"
        )
        .orderBy("media_id")
        .collect()
    )
    assert len(out) == 12
    for r in out:
        i = r["media_id"]
        if i % 3 == 2:
            img = mm._jpeg_flat_halves(i)
        else:
            w, h = 4 + (i * 7) % 13, 3 + (i * 11) % 9
            p = np.arange(w * h, dtype=np.int64)
            img = ((i * 131 + p * 7) % 256).astype(np.uint8).reshape(h, w)
        assert (r["width"], r["height"]) == (img.shape[1], img.shape[0])
        assert r["mean_px"] == pytest.approx(img.mean(), abs=1e-9)
        assert r["std_px"] == pytest.approx(img.std(), abs=1e-9)


def test_vectorized_scan_matches_block_walk():
    """The numpy entropy encoder must be byte-identical to walking
    _encode_block + _BitWriter over the same blocks — gray single
    component (trivial interleave) and a 3-component 4:2:0-shaped
    interleave (4 Y + 1 Cb + 1 Cr per MCU)."""
    rng = np.random.RandomState(11)

    def loop_scan(zz_lists, bpm):
        dc_codes = [jpeg._build_codes(jpeg.DC_LUM_BITS, jpeg.DC_LUM_VALS)]
        ac_codes = [jpeg._build_codes(jpeg.AC_LUM_BITS, jpeg.AC_LUM_VALS)]
        if len(zz_lists) > 1:
            dcc = jpeg._build_codes(jpeg.DC_CHR_BITS, jpeg.DC_CHR_VALS)
            acc = jpeg._build_codes(jpeg.AC_CHR_BITS, jpeg.AC_CHR_VALS)
            dc_codes += [dcc] * (len(zz_lists) - 1)
            ac_codes += [acc] * (len(zz_lists) - 1)
        w = jpeg._BitWriter()
        preds = [0] * len(zz_lists)
        ptrs = [0] * len(zz_lists)
        mcus = len(zz_lists[0]) // bpm[0]
        for _ in range(mcus):
            for ci, zl in enumerate(zz_lists):
                for _b in range(bpm[ci]):
                    preds[ci] = jpeg._encode_block(
                        w, zl[ptrs[ci]], preds[ci],
                        dc_codes[ci], ac_codes[ci],
                    )
                    ptrs[ci] += 1
        return w.flush()

    def rand_blocks(n):
        zz = np.zeros((n, 64), np.int64)
        for i in range(n):
            nz = rng.randint(0, 24)
            pos = rng.choice(64, size=nz, replace=False)
            zz[i, pos] = rng.randint(-255, 256, size=nz)
        return zz

    # gray: one component, 1 block per MCU
    zz = rand_blocks(40)
    dc_l = jpeg._build_codes(jpeg.DC_LUM_BITS, jpeg.DC_LUM_VALS)
    ac_l = jpeg._build_codes(jpeg.AC_LUM_BITS, jpeg.AC_LUM_VALS)
    got = jpeg._assemble_scan(
        [jpeg._encode_component_bits(zz, dc_l, ac_l)], [1], 40
    )
    assert got == loop_scan([zz], [1])

    # color 4:2:0 interleave: 6 MCUs of (4 Y, 1 Cb, 1 Cr)
    y, cb, cr = rand_blocks(24), rand_blocks(6), rand_blocks(6)
    dc_c = jpeg._build_codes(jpeg.DC_CHR_BITS, jpeg.DC_CHR_VALS)
    ac_c = jpeg._build_codes(jpeg.AC_CHR_BITS, jpeg.AC_CHR_VALS)
    got = jpeg._assemble_scan(
        [
            jpeg._encode_component_bits(y, dc_l, ac_l),
            jpeg._encode_component_bits(cb, dc_c, ac_c),
            jpeg._encode_component_bits(cr, dc_c, ac_c),
        ],
        [4, 1, 1],
        6,
    )
    assert got == loop_scan([y, cb, cr], [4, 1, 1])
