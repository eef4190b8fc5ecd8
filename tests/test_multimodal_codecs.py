"""Real-codec roundtrip invariants (F11): the PPM/WAV encoders emit
spec-valid containers and the decoders recover the exact planted features —
pure-Python checks plus the distributed encode→decode chain."""

from __future__ import annotations

import io
import wave

import numpy as np

from transilien_api_etl_spark.operators.multimodal import (
    _encode_ppm,
    _encode_wav,
    decode_media_features,
    encode_synthetic_media,
)


def test_ppm_bytes_are_spec_valid():
    for doc_id in (0, 2, 14, 256, 9998):
        payload = _encode_ppm(doc_id)
        assert payload.startswith(b"P6\n")
        header, dims, maxval, px = payload.split(b"\n", 3)
        w, h = (int(x) for x in dims.split())
        assert (w, h) == (doc_id % 16 + 4, doc_id % 8 + 3)
        assert maxval == b"255"
        arr = np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3)
        assert int(arr[..., 0].mean()) == doc_id % 256
        assert int(arr[..., 2].mean()) == (doc_id * 13) % 256


def test_wav_bytes_readable_by_stdlib():
    for doc_id in (1, 3, 999, 2001):
        rd = wave.open(io.BytesIO(_encode_wav(doc_id)), "rb")
        assert rd.getframerate() == 8000
        assert rd.getnframes() == doc_id % 50 + 10
        samples = np.frombuffer(rd.readframes(rd.getnframes()), dtype="<i2")
        assert (samples == doc_id % 1999 - 999).all()


def test_distributed_encode_decode_chain(spark):
    ids = spark.range(0, 40).withColumnRenamed("id", "doc_id")
    out = decode_media_features(encode_synthetic_media(ids)).toPandas()
    assert len(out) == 40
    img = out[out["modality"] == "image"]
    aud = out[out["modality"] == "audio"]
    assert len(img) == 20 and len(aud) == 20
    assert (img["mean_r"] == img["doc_id"] % 256).all()
    assert img[["framerate", "n_samples", "peak"]].isna().all().all()
    assert (aud["framerate"] == 8000).all()
    assert (aud["n_bytes"] == 44 + 2 * (aud["doc_id"] % 50 + 10)).all()
    assert aud[["width", "height", "mean_r"]].isna().all().all()


def test_decode_payloads_dispatcher_refuses_then_stubs(spark):
    """VERDICT r2 task 8: the public decode entry point must route real
    codecs unconditionally, REFUSE undecodable mimes at plan time, and
    reach the stub only via explicit allow_stub=True."""
    import pytest

    from transilien_api_etl_spark.operators.multimodal import (
        decode_payloads,
        encode_synthetic_media,
    )

    ids = spark.range(0, 8).withColumnRenamed("id", "doc_id")
    media = encode_synthetic_media(ids)

    # real codecs: decoded end-to-end, no stub involved
    out = decode_payloads(media).orderBy("doc_id").collect()
    assert len(out) == 8
    assert {r["modality"] for r in out} == {"image", "audio"}

    # an undecodable mime refuses loudly at plan-construction time
    from pyspark.sql import functions as F

    weird = media.withColumn(
        "mime",
        F.when(F.col("doc_id") == 0, F.lit("video/mp4")).otherwise(F.col("mime")),
    )
    with pytest.raises(ValueError, match="video/mp4"):
        decode_payloads(weird)

    # ... and decodes as 'stub' only under the explicit opt-in
    mixed = decode_payloads(weird, allow_stub=True).collect()
    by_id = {r["doc_id"]: r for r in mixed}
    assert by_id[0]["modality"] == "stub"
    assert by_id[0]["mean_r"] is None and by_id[0]["width"] is not None
    assert by_id[2]["modality"] == "image" and by_id[1]["modality"] == "audio"


def test_decode_payloads_null_mime_refuses_then_stubs(spark):
    """Review fix: a NULL mime must refuse at plan time (not crash with
    AttributeError) and must route to the stub — not silently vanish —
    under allow_stub=True."""
    import pytest

    from pyspark.sql import functions as F

    from transilien_api_etl_spark.operators.multimodal import (
        decode_payloads,
        encode_synthetic_media,
    )

    ids = spark.range(0, 4).withColumnRenamed("id", "doc_id")
    media = encode_synthetic_media(ids).withColumn(
        "mime",
        F.when(F.col("doc_id") == 0, F.lit(None).cast("string")).otherwise(
            F.col("mime")
        ),
    )
    with pytest.raises(ValueError, match="None"):
        decode_payloads(media)
    out = {r["doc_id"]: r for r in decode_payloads(media, allow_stub=True).collect()}
    assert len(out) == 4  # the null-mime row was not dropped
    assert out[0]["modality"] == "stub"


def test_decode_payloads_lazy_validation(spark):
    """ADVICE r3: validate='lazy' must not run a plan-construction-time
    Spark job (no eager distinct over a possibly-expensive upstream plan);
    unknown mimes then raise inside the decode batch at task time, and
    allow_stub routing still works via the static mime predicate."""
    import pytest

    from pyspark.sql import functions as F

    from transilien_api_etl_spark.operators.multimodal import (
        decode_payloads,
        encode_synthetic_media,
    )

    ids = spark.range(0, 8).withColumnRenamed("id", "doc_id")
    media = encode_synthetic_media(ids)

    # plan construction runs NO job: poison the mime column ITSELF with a
    # UDF that explodes if any row is computed — eager validation's
    # select('mime').distinct().collect() MUST trip it (proving the trap
    # is live, not pruned), lazy mode must not
    from pyspark.sql.types import StringType

    booby = F.udf(
        lambda m: (_ for _ in ()).throw(RuntimeError("eager scan!")), StringType()
    )
    poisoned = media.withColumn("mime", booby("mime"))
    with pytest.raises(Exception, match="eager scan"):
        decode_payloads(poisoned, validate="eager")
    decode_payloads(poisoned, validate="lazy")  # no error: no plan-time job

    # all-real corpus decodes identically to eager mode
    lazy = {r["doc_id"]: r for r in decode_payloads(media, validate="lazy").collect()}
    eager = {r["doc_id"]: r for r in decode_payloads(media).collect()}
    assert lazy.keys() == eager.keys()
    assert all(lazy[k]["modality"] == eager[k]["modality"] for k in lazy)

    # unknown mime: raises at TASK time (collect), not plan time
    weird = media.withColumn(
        "mime",
        F.when(F.col("doc_id") == 0, F.lit("video/mp4")).otherwise(F.col("mime")),
    )
    plan = decode_payloads(weird, validate="lazy")  # plan builds fine
    with pytest.raises(Exception, match="video/mp4"):
        plan.collect()

    # allow_stub + lazy: unknown and null mimes route to the stub branch
    nulled = weird.withColumn(
        "mime",
        F.when(F.col("doc_id") == 1, F.lit(None).cast("string")).otherwise(F.col("mime")),
    )
    out = {
        r["doc_id"]: r
        for r in decode_payloads(nulled, allow_stub=True, validate="lazy").collect()
    }
    assert len(out) == 8
    assert out[0]["modality"] == "stub" and out[1]["modality"] == "stub"
    assert out[2]["modality"] == "image" and out[3]["modality"] == "audio"


def test_null_payload_rows_are_skipped_not_crashed(spark):
    """attach_payload over a NULL source column yields a NULL payload; the
    decode/feature/resize paths must skip such rows (sample_frames'
    contract) instead of TypeError-ing the whole job on len(None)
    (round-5 review)."""
    from transilien_api_etl_spark.operators.multimodal import (
        decode_features,
        resize_payloads,
        sample_frames,
    )

    df = spark.createDataFrame(
        [
            (1, bytearray(b"abcdef"), {"mime": "text/plain", "n_bytes": 6}),
            (2, None, {"mime": "text/plain", "n_bytes": 0}),
        ],
        "doc_id long, payload binary, meta map<string,string>",
    )
    # meta as struct like attach_payload produces
    from pyspark.sql import functions as F

    df = df.select(
        "doc_id",
        "payload",
        F.struct(
            F.col("meta")["mime"].alias("mime"),
            F.col("meta")["n_bytes"].cast("long").alias("n_bytes"),
        ).alias("meta"),
    )
    assert {r.doc_id for r in decode_features(df).collect()} == {1}
    assert {r.doc_id for r in resize_payloads(df, 4, 2).collect()} == {1}
    assert {r.doc_id for r in sample_frames(df, 2, 1).select("doc_id").distinct().collect()} == {1}

    media = spark.createDataFrame(
        [(3, None, "image/x-portable-pixmap")],
        "doc_id long, payload binary, mime string",
    )
    assert decode_media_features(media).count() == 0
