"""Pure-stdlib AVI video codec: lossless round-trips over varied geometry,
hand-built container checks, frame-stat sampling, error cases, and the
RealVideoFrameSampler actor-stage contract over real bytes."""

import struct

import numpy as np
import pytest

from apache___solr_ray.stages.videocodec import (
    VideoDecodeError,
    avi_frame_stats,
    decode_avi,
    encode_avi,
)


def _clip(n, h, w, seed=0):
    return np.random.Generator(np.random.PCG64(seed)).integers(
        0, 256, size=(n, h, w, 3), dtype=np.uint8
    )


@pytest.mark.parametrize(
    "n,h,w,fps",
    [(1, 8, 8, 10), (7, 9, 13, 25), (30, 17, 5, 20), (12, 32, 32, 25)],
)
def test_avi_roundtrip_exact(n, h, w, fps):
    frames = _clip(n, h, w, seed=n * 100 + w)
    payload = encode_avi(frames, fps)
    dec, fps2 = decode_avi(payload)
    assert fps2 == fps
    assert dec.shape == frames.shape
    assert (dec == frames).all()  # raw-DIB encode is lossless


def test_avi_container_structure():
    """The emitted container is a well-formed RIFF AVI: header fourccs in
    place, one 00db chunk per frame, row padding to 4 bytes."""
    frames = _clip(3, 5, 5, seed=9)  # 5*3=15 bytes/row -> padded to 16
    payload = encode_avi(frames, 25)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"AVI "
    assert payload.count(b"00db") == 3 + 3  # movi chunks + idx1 entries
    for fourcc in (b"hdrl", b"avih", b"strl", b"strh", b"strf", b"movi", b"idx1"):
        assert fourcc in payload
    # strf BITMAPINFOHEADER carries the geometry
    ps = payload.index(b"strf") + 8
    _, bw, bh, _, bc = struct.unpack_from("<IiiHH", payload, ps)
    assert (bw, bh, bc) == (5, 5, 24)


def test_frame_stats_sampling_and_timing():
    frames = _clip(23, 6, 7, seed=4)
    st = avi_frame_stats(encode_avi(frames, 20), stride=5)
    assert st["n_frames"] == 23 and st["fps"] == 20
    assert st["width"] == 7 and st["height"] == 6
    assert list(st["frame_idx"]) == [0, 5, 10, 15, 20]
    assert list(st["ts_ms"]) == [0, 250, 500, 750, 1000]  # 50 ms/frame
    exp = np.floor(frames[::5].astype(np.float64).mean(axis=(1, 2, 3)) * 10000 + 0.5) / 10000
    assert np.array_equal(st["mean_px"], exp)


def test_decode_errors():
    with pytest.raises(VideoDecodeError):
        decode_avi(b"not a riff container")
    with pytest.raises(VideoDecodeError):
        decode_avi(b"RIFF\x00\x00\x00\x00WAVE")  # RIFF but not AVI
    good = encode_avi(_clip(2, 4, 4), 10)
    with pytest.raises(VideoDecodeError):
        decode_avi(good[:64])  # headers truncated away


def test_real_video_sampler_stage(ray_session):
    """RealVideoFrameSampler explodes one row per sampled frame with the
    genuinely decoded per-frame mean."""
    import pyarrow as pa
    import ray.data as rd

    from apache___solr_ray.stages.multimodal import RealVideoFrameSampler

    clips = [_clip(11, 6, 6, seed=s) for s in range(3)]
    t = pa.table(
        {
            "vid_id": pa.array([0, 1, 2], pa.int64()),
            "payload": pa.array([encode_avi(c, 25) for c in clips], pa.binary()),
        }
    )
    out = (
        rd.from_arrow(t)
        .map_batches(RealVideoFrameSampler, batch_format="pyarrow", batch_size=2, concurrency=1)
        .to_pandas()
        .sort_values(["vid_id", "frame_idx"])
        .reset_index(drop=True)
    )
    assert len(out) == 3 * 3  # frames 0,5,10 per clip
    for vid, clip in enumerate(clips):
        sub = out[out.vid_id == vid]
        assert list(sub.frame_idx) == [0, 5, 10]
        assert list(sub.ts_ms) == [0, 200, 400]
        exp = np.floor(clip[::5].astype(np.float64).mean(axis=(1, 2, 3)) * 10000 + 0.5) / 10000
        assert np.array_equal(sub.mean_px.to_numpy(), exp)


def test_video_corpus_truth_recoverable():
    """Every corpus clip's per-frame truth is recoverable from its bytes
    alone — the property the multimodal_video_real oracle hashes."""
    import pyarrow.parquet as pq

    from apache___solr_ray.pipelines.text import ensure_video_corpus

    tbl = pq.read_table(ensure_video_corpus())
    assert tbl.num_rows == 96
    for row in tbl.slice(0, 12).to_pylist():
        st = avi_frame_stats(row["payload"], stride=1)
        assert st["n_frames"] == row["n_frames_true"]
        assert st["fps"] == row["fps_true"]
        assert np.array_equal(st["mean_px"], np.asarray(row["frame_means_true"]))
