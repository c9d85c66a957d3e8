"""Pure-stdlib image codecs: golden round-trips (BMP/PPM/PNG), hand-built
PNG Average/Paeth filter scanlines, sniffing, and the RealImageDecoder
actor-stage contract over real bytes."""

import struct
import zlib

import numpy as np
import pytest

from apache___solr_ray.stages.imagecodec import (
    PNG_SIG,
    ImageDecodeError,
    decode_bmp,
    decode_image,
    decode_png,
    decode_pnm,
    encode_bmp,
    encode_png,
    encode_ppm,
)


def _rand(h, w, c, seed=0):
    return np.random.Generator(np.random.PCG64(seed)).integers(
        0, 256, size=(h, w, c), dtype=np.uint8
    )


def test_bmp_roundtrip_exact():
    for h, w, seed in [(1, 1, 1), (5, 7, 2), (16, 9, 3), (33, 31, 4)]:
        img = _rand(h, w, 3, seed)
        out = decode_bmp(encode_bmp(img))
        assert out.shape == (h, w, 3)
        assert np.array_equal(out, img)


def test_ppm_roundtrip_exact_and_ascii():
    img = _rand(11, 6, 3, 9)
    assert np.array_equal(decode_pnm(encode_ppm(img)), img)
    # ASCII P2 grayscale with a comment line
    g = _rand(3, 4, 1, 5)
    txt = b"P2\n# comment\n4 3\n255\n" + " ".join(
        str(int(x)) for x in g.reshape(-1)
    ).encode()
    assert np.array_equal(decode_pnm(txt), g)


@pytest.mark.parametrize("filter_type", [0, 1, 2])
@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_roundtrip_exact(filter_type, channels):
    img = _rand(13, 8, channels, seed=filter_type * 10 + channels)
    out = decode_png(encode_png(img, filter_type=filter_type))
    assert out.shape == img.shape
    assert np.array_equal(out, img)


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def _reference_filter(img: np.ndarray, ftype: int) -> bytes:
    """Slow independent PNG filtering (spec pseudocode) to build scanlines
    the encoder doesn't produce — exercises the decoder's Average/Paeth
    reconstruction against a second implementation."""
    h, w, c = img.shape
    flat = img.reshape(h, w * c).astype(int)
    out = b""
    prev = np.zeros(w * c, dtype=int)
    for y in range(h):
        row = flat[y]
        enc = []
        for x in range(w * c):
            a = row[x - c] if x >= c else 0
            b = prev[x]
            cc = prev[x - c] if x >= c else 0
            if ftype == 3:
                enc.append((row[x] - (a + b) // 2) % 256)
            else:  # Paeth
                p = a + b - cc
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa_ <= pb_ and pa_ <= pc_) else (b if pb_ <= pc_ else cc)
                enc.append((row[x] - pred) % 256)
        out += bytes([ftype]) + bytes(enc)
        prev = row
    return out


@pytest.mark.parametrize("ftype", [3, 4])
def test_png_average_and_paeth_filters(ftype):
    img = _rand(9, 7, 3, seed=40 + ftype)
    ihdr = struct.pack(">IIBBBBB", 7, 9, 8, 2, 0, 0, 0)
    raw = _reference_filter(img, ftype)
    png = (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(png), img)


def test_sniffing_and_errors():
    img = _rand(4, 4, 3, 77)
    assert np.array_equal(decode_image(encode_bmp(img)), img)
    assert np.array_equal(decode_image(encode_ppm(img)), img)
    assert np.array_equal(decode_image(encode_png(img, 1)), img)
    with pytest.raises(ImageDecodeError):
        decode_image(b"\xff\xd8\xff\xe0JFIF")  # JPEG: honestly unsupported
    with pytest.raises(ImageDecodeError):
        decode_image(b"")
    with pytest.raises(ImageDecodeError):
        decode_png(PNG_SIG + b"\x00" * 16)  # no IHDR/IDAT


def test_real_image_decoder_stage():
    import pyarrow as pa

    from apache___solr_ray.stages.multimodal import RealImageDecoder

    imgs = [_rand(10, 5, 3, s) for s in range(3)]
    payloads = [encode_bmp(imgs[0]), encode_ppm(imgs[1]), encode_png(imgs[2], 2)]
    t = pa.table(
        {"img_id": pa.array([0, 1, 2], pa.int64()), "payload": pa.array(payloads, pa.binary())}
    )
    out = RealImageDecoder()(t)
    assert out.column_names == ["img_id", "width", "height", "channels", "mean_px"]
    assert out.column("width").to_pylist() == [5, 5, 5]
    assert out.column("height").to_pylist() == [10, 10, 10]
    assert out.column("channels").to_pylist() == [3, 3, 3]
    want = [float(np.floor(i.mean() * 10000 + 0.5) / 10000) for i in imgs]
    assert out.column("mean_px").to_pylist() == want


def test_image_corpus_truth_recoverable():
    """Every corpus payload decodes back to its stored ground truth."""
    import pyarrow.parquet as pq

    from apache___solr_ray.pipelines.text import ensure_image_corpus

    t = pq.read_table(ensure_image_corpus())
    for r in t.to_pylist()[:60]:
        arr = decode_image(r["payload"])
        assert arr.shape == (r["height_true"], r["width_true"], r["channels_true"])
        assert float(np.floor(arr.mean() * 10000 + 0.5) / 10000) == r["mean_true"]


# -- audio (PCM WAV via stdlib wave) ------------------------------------------


def test_wav_roundtrip_exact():
    import numpy as np

    from apache___solr_ray.stages.audiocodec import decode_wav, encode_wav

    rng = np.random.Generator(np.random.PCG64(3))
    mono = rng.integers(-32000, 32000, 800, dtype=np.int16)
    arr, rate = decode_wav(encode_wav(mono, 8000))
    assert rate == 8000 and arr.shape == (800, 1)
    assert np.array_equal(arr[:, 0], mono)
    stereo = rng.integers(-32000, 32000, (300, 2), dtype=np.int16)
    arr2, rate2 = decode_wav(encode_wav(stereo, 16000))
    assert rate2 == 16000 and arr2.shape == (300, 2)
    assert np.array_equal(arr2, stereo)


def test_wav_features_and_errors():
    import numpy as np
    import pytest as _pt

    from apache___solr_ray.stages.audiocodec import AudioDecodeError, encode_wav, wav_features

    x = (np.ones(8000) * 1000).astype(np.int16)
    f = wav_features(encode_wav(x, 8000))
    assert f["duration_sec"] == 1.0 and f["rms"] == 1000.0 and f["peak"] == 1000
    with _pt.raises(AudioDecodeError):
        wav_features(b"\xff\xd8not a wav")


def test_audio_corpus_truth_recoverable():
    import pyarrow.parquet as pq

    from apache___solr_ray.pipelines.text import ensure_audio_corpus
    from apache___solr_ray.stages.audiocodec import wav_features

    t = pq.read_table(ensure_audio_corpus())
    for r in t.to_pylist()[:40]:
        f = wav_features(r["payload"])
        assert f["duration_sec"] == r["duration_true"]
        assert f["rms"] == r["rms_true"]
        assert f["channels"] == r["channels_true"]
