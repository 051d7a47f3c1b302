import os

import numpy as np

from jmcodec_tpu.codec.h264.refenc import encode_stream
from jmcodec_tpu.pipeline.gop import GopJob, TranscodeManifest, split_gops
from jmcodec_tpu.codec.h264.refdec import H264ReferenceDecoder

from util_oracle import make_frame


def _stream(n=3):
    frames = [make_frame(32, 32, seed=i) for i in range(n)]
    s, _ = encode_stream(frames, 32, 32, qp=30)
    return s


def test_split_gops_idr_boundaries():
    s = _stream(3)
    gops = split_gops(s)
    assert len(gops) == 3
    # each GOP must decode standalone... first carries SPS/PPS; re-prepending
    # headers makes all standalone
    dec = H264ReferenceDecoder()
    head = s[:gops[0][0]] if gops[0][0] else b""
    for (a, b) in gops:
        out = dec.decode_annexb(s[a:b])
        assert len(out) == 1
    assert gops[0][0] == 0
    assert gops[-1][1] == len(s)


def test_manifest_claim_complete_resume(tmp_path):
    s = _stream(4)
    out = str(tmp_path / "job")
    m = TranscodeManifest.create("in.h264", out, stream=s)
    assert len(m.jobs) == 4
    m.save()

    j1 = m.claim("worker-a")
    j2 = m.claim("worker-b")
    assert j1.index != j2.index
    m.complete(j1.index, "seg0.h264")
    assert m.done() == 1

    # resume from disk: done job is kept, running job is NOT reclaimed young
    m2 = TranscodeManifest.load(out)
    assert m2.done() == 1
    claimed = {j.index for j in m2.jobs if j.status == "running"}
    assert j2.index in claimed
    j3 = m2.claim("worker-c")
    assert j3.index not in (j1.index, j2.index)

    # stale running job is reclaimed after timeout
    # claim() is a locked read-modify-write against the on-disk manifest, so
    # the staleness must be persisted, not just poked in memory
    m2.jobs[j2.index].updated -= 1000
    m2.save()
    j4 = m2.claim("worker-d")
    assert j4.index == j2.index
