"""TFRecord framing, Arrow IPC round trip, timeseries gap fill (S5/S6/S9)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from ml_data_pipeline_ray.sources.arrow_ipc import (read_arrow_ipc,
                                                    read_arrow_ipc_dataset,
                                                    write_arrow_ipc)
from ml_data_pipeline_ray.sources.tfrecord import (masked_crc,
                                                   read_tfrecord_file,
                                                   read_tfrecords,
                                                   write_tfrecords)
from ml_data_pipeline_ray.stages.timeseries import (fill_gaps, infer_regularity,
                                                    parse_frequency,
                                                    regularize_per_key)


def test_tfrecord_roundtrip(tmp_path):
    recs = [b"hello", b"", b"x" * 1000, bytes(range(256))]
    p = str(tmp_path / "a.tfrecord")
    write_tfrecords(recs, p)
    t = read_tfrecord_file(p)
    assert t.column("data").to_pylist() == recs
    assert t.column("length").to_pylist() == [len(r) for r in recs]
    # offsets point at each record's frame start
    offs = t.column("offset").to_pylist()
    assert offs[0] == 0 and offs[1] == 8 + 4 + 5 + 4


def test_tfrecord_crc_detects_corruption(tmp_path):
    p = str(tmp_path / "b.tfrecord")
    write_tfrecords([b"payload-one", b"payload-two"], p)
    raw = bytearray(open(p, "rb").read())
    raw[14] ^= 0xFF  # flip a payload byte
    open(p, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="CRC mismatch"):
        read_tfrecord_file(p)
    # verify_crc=False tolerates it (reference behavior with its stub CRC)
    t = read_tfrecord_file(p, verify_crc=False)
    assert t.num_rows == 2
    assert masked_crc(b"abc") != masked_crc(b"abd")


@pytest.mark.usefixtures("ray_session")
def test_tfrecords_dataset(tmp_path):
    for i in range(3):
        write_tfrecords([f"r{i}-{j}".encode() for j in range(4)],
                        str(tmp_path / f"f{i}.tfrecord"))
    ds = read_tfrecords([str(tmp_path / f"f{i}.tfrecord") for i in range(3)])
    assert ds.count() == 12


@pytest.mark.usefixtures("ray_session")
def test_arrow_ipc_roundtrip(tmp_path):
    t = pa.table({"a": [1, 2, 3], "b": ["x", None, "z"]})
    p = str(tmp_path / "t.arrow")
    write_arrow_ipc(t, p)
    assert read_arrow_ipc(p).equals(t)
    assert read_arrow_ipc(p, memory_map=False).equals(t)
    assert read_arrow_ipc_dataset(p).count() == 3


@pytest.mark.usefixtures("ray_session")
def test_csv_comment_lines_are_skipped(tmp_path):
    from ml_data_pipeline_ray.sources import read_csv_typed

    p = str(tmp_path / "c.csv")
    with open(p, "w") as f:
        f.write("a,b,flag\n1,x,yes\n# full comment line\n2,y,no\n"
                "#short\n3,z,t\n")
    ds = read_csv_typed(p, comment="#")
    df = ds.to_pandas().sort_values("a").reset_index(drop=True)
    assert df["a"].tolist() == [1, 2, 3]
    assert df["b"].tolist() == ["x", "y", "z"]
    assert df["flag"].tolist() == [True, False, True]


@pytest.mark.usefixtures("ray_session")
def test_read_json_typed(tmp_path):
    from ml_data_pipeline_ray.sources import read_json_typed

    p = str(tmp_path / "d.jsonl")
    with open(p, "w") as f:
        f.write('{"a": 1, "b": "x"}\n{"a": 2, "b": "y"}\n{"a": 3}\n')
    df = read_json_typed(p).to_pandas().sort_values("a").reset_index(drop=True)
    assert df["a"].tolist() == [1, 2, 3]
    assert df["b"].tolist()[:2] == ["x", "y"]
    # declared schema: widen + null-fill a missing column
    schema = pa.schema([("a", pa.float64()), ("b", pa.string()),
                        ("c", pa.int64())])
    df2 = read_json_typed(p, schema=schema).to_pandas()
    assert df2["a"].dtype == np.float64 and df2["c"].isna().all()


@pytest.mark.usefixtures("ray_session")
def test_read_text_lines_multifile(tmp_path):
    from ml_data_pipeline_ray.sources import read_text_lines

    p1, p2 = str(tmp_path / "t1.txt"), str(tmp_path / "t2.txt")
    open(p1, "wb").write(b"\xef\xbb\xbf" + "alpha\n  beta  \n\ngamma\n".encode())
    open(p2, "w").write("delta\n")
    ds = read_text_lines([p1, p2], trim=True, skip_empty=True)
    df = ds.to_pandas()
    # per-file 1-based numbering with gaps for skipped empties
    assert sorted(df["text"]) == ["alpha", "beta", "delta", "gamma"]
    assert df.loc[df.text == "gamma", "line_number"].iloc[0] == 4
    assert df.loc[df.text == "delta", "line_number"].iloc[0] == 1


def test_parse_frequency():
    assert parse_frequency("5min") == 5 * 60 * 1_000_000_000
    assert parse_frequency("1h") == 3_600 * 1_000_000_000
    assert parse_frequency("s") == 1_000_000_000
    assert parse_frequency("2 d") == 2 * 86_400 * 1_000_000_000
    with pytest.raises(ValueError):
        parse_frequency("fortnight")


def test_infer_regularity_and_fill():
    ts = pd.to_datetime(["2026-01-01 00:00", "2026-01-01 00:05",
                         "2026-01-01 00:15", "2026-01-01 00:20"])
    reg = infer_regularity(pd.Series(ts))
    assert not reg["regular"] and reg["freq_ns"] == 5 * 60 * 1_000_000_000
    df = pd.DataFrame({"ts": ts, "v": [1.0, 2.0, 4.0, 5.0]})
    filled = fill_gaps(df, "ts", ["v"], "5min", method="linear")
    assert len(filled) == 5
    assert filled["v"].tolist() == [1.0, 2.0, 3.0, 4.0, 5.0]
    fwd = fill_gaps(df, "ts", ["v"], "5min", method="forward")
    assert fwd["v"].tolist() == [1.0, 2.0, 2.0, 4.0, 5.0]
    zero = fill_gaps(df, "ts", ["v"], "5min", method="zero")
    assert zero["v"].tolist() == [1.0, 2.0, 0.0, 4.0, 5.0]


@pytest.mark.usefixtures("ray_session")
def test_regularize_per_key():
    import ray.data as rd
    ts = pd.to_datetime(["2026-01-01 00:00", "2026-01-01 00:10",
                         "2026-01-01 00:00", "2026-01-01 00:05"])
    df = pd.DataFrame({"k": ["a", "a", "b", "b"], "ts": ts,
                       "v": [1.0, 3.0, 10.0, 11.0]})
    out = regularize_per_key(rd.from_pandas(df), "k", "ts", ["v"],
                             "5min", method="linear").to_pandas()
    a = out[out.k == "a"].sort_values("ts")["v"].tolist()
    assert a == [1.0, 2.0, 3.0]
    assert len(out[out.k == "b"]) == 2


def test_csv_row_index_and_seek(tmp_path):
    """Quote-aware row index: embedded newlines inside quoted fields must
    not become row breaks; seek lands exactly on the requested data row."""
    from ml_data_pipeline_ray.sources.readers import (build_csv_row_index,
                                                      read_csv_from_row)

    p = str(tmp_path / "q.csv")
    with open(p, "w", newline="") as f:
        f.write('id,note\n1,"line one\nline two"\n2,simple\n3,"x,y"\n')
    idx = build_csv_row_index(p)
    assert idx.size == 4                    # header + 3 data rows
    t = read_csv_from_row(p, start_row=1)
    assert t.column("id").to_pylist() == [2, 3]
    assert t.column("note").to_pylist() == ["simple", "x,y"]
    one = read_csv_from_row(p, start_row=0, num_rows=1)
    assert one.column("note").to_pylist() == ["line one\nline two"]
    assert read_csv_from_row(p, start_row=99).num_rows == 0


@pytest.mark.usefixtures("ray_session")
def test_bucketed_fill_matches_pandas_kernel():
    """The vectorized multi-series bucketed fill must equal the per-key
    pandas kernel for every non-linear method on an on-grid multi-key set."""
    import ray.data as rd
    from ml_data_pipeline_ray.stages.timeseries import (_regularize_bucketed,
                                                        fill_gaps)

    rng = np.random.default_rng(5)
    rows = []
    base = pd.Timestamp("2026-01-01")
    for k in range(12):
        hours = np.sort(rng.choice(200, size=rng.integers(2, 30),
                                   replace=False))
        for h in hours:
            rows.append({"k": f"key-{k:02d}", "ts": base + pd.Timedelta(hours=int(h)),
                         "v": float(rng.integers(0, 100))})
    df = pd.DataFrame(rows)
    for method in ("forward", "backward", "zero", "nan"):
        got = _regularize_bucketed(rd.from_pandas(df), "k", "ts", ["v"],
                                   "1h", method, num_buckets=4).to_pandas()
        got = got.sort_values(["k", "ts"]).reset_index(drop=True)
        want = []
        for k, sub in df.groupby("k"):
            f = fill_gaps(sub, "ts", ["v"], "1h", method)
            f["k"] = k
            want.append(f[["k", "ts", "v"]])
        want = (pd.concat(want).sort_values(["k", "ts"])
                .reset_index(drop=True))
        pd.testing.assert_frame_equal(got[["k", "ts", "v"]], want,
                                      check_dtype=False, obj=method)


def test_avro_roundtrip_all_types(tmp_path):
    """Avro OCF writer/reader: primitives, nullable unions, unicode, both
    codecs, multi-block files (S11 — declared-only in the reference)."""
    import pyarrow as pa

    from ml_data_pipeline_ray.sources.avro import read_avro_table, write_avro

    t = pa.table({
        "i32": pa.array([1, None, -5], pa.int32()),
        "i64": pa.array([2**62, -2**62, None], pa.int64()),
        "f": pa.array([0.5, None, -1.5], pa.float32()),
        "d": pa.array([1e300, -0.0, None], pa.float64()),
        "b": pa.array([True, None, False]),
        "s": pa.array(["α", "", None]),
        "y": pa.array([b"\x00\xff", None, b""], pa.binary()),
    })
    for codec in ("null", "deflate"):
        p = str(tmp_path / f"t_{codec}.avro")
        write_avro(t, p, codec=codec, rows_per_block=2)  # forces 2 blocks
        back = read_avro_table(p)
        assert back.equals(t.cast(back.schema)), codec


def test_avro_rejects_non_avro_and_bad_sync(tmp_path):
    import pyarrow as pa
    import pytest

    from ml_data_pipeline_ray.sources.avro import read_avro_table, write_avro

    p = str(tmp_path / "x.avro")
    with open(p, "wb") as f:
        f.write(b"PAR1not-avro")
    with pytest.raises(ValueError, match="not an Avro"):
        read_avro_table(p)

    t = pa.table({"a": pa.array([1, 2, 3], pa.int64())})
    p2 = str(tmp_path / "y.avro")
    write_avro(t, p2, codec="null")
    data = bytearray(open(p2, "rb").read())
    data[-1] ^= 0xFF                      # corrupt the trailing sync marker
    open(p2, "wb").write(bytes(data))
    with pytest.raises(ValueError, match="sync marker"):
        read_avro_table(p2)


@pytest.mark.usefixtures("ray_session")
def test_read_avro_dataset_file_parallel(tmp_path):
    import pyarrow as pa

    from ml_data_pipeline_ray.sources.avro import read_avro, write_avro

    paths = []
    for i in range(3):
        t = pa.table({"k": pa.array([i * 10 + j for j in range(10)], pa.int64()),
                      "s": pa.array([f"r{i}-{j}" for j in range(10)])})
        p = str(tmp_path / f"p{i}.avro")
        write_avro(t, p)
        paths.append(p)
    ds = read_avro(paths)
    df = ds.to_pandas().sort_values("k").reset_index(drop=True)
    assert len(df) == 30
    assert df["k"].tolist() == sorted(i * 10 + j for i in range(3) for j in range(10))


@pytest.mark.usefixtures("ray_session")
def test_write_csv_options_roundtrip(tmp_path):
    """Writer options parity: quote_style='all' survives embedded delimiters
    and quotes; bool/float/timestamp formatting and dictionary decode apply
    per type; the typed read recovers the original values."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from ml_data_pipeline_ray.sources.readers import read_csv_typed, write_csv

    t = pa.table({
        "k": pa.array([1, 2, 3], pa.int64()),
        "s": pa.array(['a,b', 'say "hi"', 'plain']),
        "d": pa.array(["x", "y", "x"]).dictionary_encode(),
        "flag": pa.array([True, False, True]),
        "v": pa.array([1.005, 2.5, -3.125], pa.float64()),
        "ts": pa.array(pd.to_datetime(["2024-01-02 03:04:05"] * 3)),
    })
    out = str(tmp_path / "csvw")
    write_csv(rd.from_arrow(t), out, quote_style="all",
              bool_format=("yes", "no"), float_precision=2,
              timestamp_format="%Y-%m-%dT%H:%M:%S")
    import glob
    files = sorted(glob.glob(out + "/*.csv"))
    raw = open(files[0]).read()
    assert '"a,b"' in raw and '"say ""hi"""' in raw     # quoting + escaping
    assert "yes" in raw and "no" in raw
    assert "2024-01-02T03:04:05" in raw
    back = read_csv_typed(files, schema=pa.schema(
        [("k", pa.int64()), ("s", pa.string()), ("d", pa.string()),
         ("flag", pa.bool_()), ("v", pa.float64()), ("ts", pa.string())]))
    df = back.to_pandas().sort_values("k").reset_index(drop=True)
    assert df["s"].tolist() == ['a,b', 'say "hi"', 'plain']
    assert df["d"].tolist() == ["x", "y", "x"]          # dictionary decoded
    assert df["flag"].tolist() == [True, False, True]
    assert np.allclose(df["v"].to_numpy(), [1.0, 2.5, -3.12], atol=0.011)
    # quote_style='none' raises when a value would need quoting
    with pytest.raises(Exception):
        write_csv(rd.from_arrow(t.select(["k", "s"])),
                  str(tmp_path / "csvn"), quote_style="none")
