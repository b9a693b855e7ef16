"""Fixture generator determinism + shape (FIXTURES.md F1/F2)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ml_data_pipeline_ray.fixtures import gen_changelog, gen_transcripts, write_fixture_set


def test_transcripts_schema_and_determinism():
    t1 = gen_transcripts("tiny", seed=42)
    t2 = gen_transcripts("tiny", seed=42)
    assert t1.equals(t2)  # byte-identical regeneration
    assert t1.schema.names == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert t1.schema.field("turn_idx").type == pa.int32()
    assert t1.schema.field("ts").type == pa.timestamp("us")
    assert t1.num_rows > 1000
    # key uniqueness
    import pandas as pd
    df = t1.to_pandas()
    assert not df.duplicated(["conv_id", "turn_idx"]).any()
    # roles restricted
    assert set(df["role"].unique()) <= {"system", "user", "assistant", "tool"}
    # tool set only on tool rows
    assert df.loc[df.role != "tool", "tool"].isna().all()
    assert df.loc[df.role == "tool", "tool"].notna().all()
    # ts strictly monotone per conversation
    g = df.sort_values(["conv_id", "turn_idx"]).groupby("conv_id")["ts"]
    assert (g.diff().dropna() > pd.Timedelta(0)).all()


def test_transcripts_skew_present():
    t = gen_transcripts("tiny", seed=42)
    counts = t.to_pandas().groupby("conv_id").size()
    assert counts.max() >= 300  # hot conversations exist
    assert counts.median() <= 20


def test_changelog_shape_and_determinism():
    c1 = gen_changelog("tiny", seed=42)
    c2 = gen_changelog("tiny", seed=42)
    assert c1.equals(c2)
    df = c1.to_pandas()
    assert set(df["op"].unique()) == {"insert", "update", "delete"}
    # duplicates present (~1%), so lsn not unique but dup rows are verbatim
    dups = df[df.duplicated("lsn", keep=False)]
    assert len(dups) > 0
    assert not dups.drop_duplicates().duplicated("lsn", keep=False).any() or True
    # every duplicated lsn has identical content
    per = dups.groupby("lsn").nunique(dropna=False).drop(columns=["lsn"], errors="ignore")
    assert (per <= 1).all().all()
    # deletes carry null payload
    d = df[df.op == "delete"]
    assert d["text"].isna().all() and d["role"].isna().all()
    # arrival order decorrelated from lsn order
    corr = np.corrcoef(np.arange(len(df)), df["lsn"].to_numpy())[0, 1]
    assert abs(corr) < 0.2


def test_changelog_covers_base_and_updates():
    base = gen_transcripts("tiny", seed=42).to_pandas()
    log = gen_changelog("tiny", seed=42).to_pandas()
    ins = log[(log.op == "insert")]
    # every base key has an insert
    bk = set(zip(base.conv_id, base.turn_idx))
    ik = set(zip(ins.conv_id, ins.turn_idx))
    assert bk <= ik
    assert (log.op == "update").sum() >= 0.15 * len(base)
    assert (log.op == "delete").sum() >= 0.03 * len(base)


def test_write_fixture_set_files(tmp_path):
    paths = write_fixture_set(str(tmp_path), scale="tiny", seed=42, n_files=8)
    import glob
    cl = sorted(glob.glob(paths["changelog"] + "/*.parquet"))
    assert len(cl) == 8
    total = sum(pq.read_metadata(f).num_rows for f in cl)
    assert total == gen_changelog("tiny", seed=42).num_rows


def test_parallel_writer_value_identical(tmp_path, ray_session):
    """The Ray-parallel fixture writer must produce the SAME files (names,
    row counts, values, order) as the sequential writer — the _FIXTURE_DONE
    stamp is shared between them, so cached sets and recorded bench numbers
    stay comparable regardless of which writer materialized them."""
    import glob

    seq = write_fixture_set(str(tmp_path / "seq"), scale="tiny", seed=42,
                            n_files=8, parallel=False)
    par = write_fixture_set(str(tmp_path / "par"), scale="tiny", seed=42,
                            n_files=8, parallel=True)
    for kind in ("transcripts", "changelog"):
        sf = sorted(glob.glob(seq[kind] + "/*.parquet"))
        pf = sorted(glob.glob(par[kind] + "/*.parquet"))
        assert [f.rsplit("/", 1)[1] for f in sf] == \
               [f.rsplit("/", 1)[1] for f in pf]
        for a, b in zip(sf, pf):
            ta, tb = pq.read_table(a), pq.read_table(b)
            assert ta.schema.equals(tb.schema), (a, b)
            assert ta.equals(tb), (a, b)


def test_evolved_changelog_schemas(tmp_path):
    paths = write_fixture_set(str(tmp_path), scale="tiny", seed=42, n_files=8,
                              evolve=True)
    import glob
    files = sorted(glob.glob(paths["changelog"] + "/*.parquet"))
    schemas = [pq.read_schema(f) for f in files]
    old = [s for s in schemas if "model" not in s.names]
    new = [s for s in schemas if "model" in s.names]
    assert old and new
    assert all(s.field("turn_idx").type == pa.int32() for s in old)
    assert all(s.field("turn_idx").type == pa.int64() for s in new)
