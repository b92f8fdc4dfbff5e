"""Dedup-family tests with planted duplicates / near-duplicates."""

from __future__ import annotations

import numpy as np
import pytest


def _docs_with_dups(ray_session):
    """60 base docs + planted exact dups + planted near-dups."""
    import ray.data as rd
    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(500)]
    rows = []
    for i in range(60):
        words = rng.choice(vocab, 60).tolist()
        rows.append({"doc_id": i, "text": " ".join(words)})
    # exact dups of docs 0..4 (ids 100..104)
    for i in range(5):
        rows.append({"doc_id": 100 + i, "text": rows[i]["text"]})
    # near-dups of docs 10..14 (ids 200..204): change 3 of 60 words
    for i in range(5):
        words = rows[10 + i]["text"].split()
        for j in range(3):
            words[7 * j] = "changed%d" % j
        rows.append({"doc_id": 200 + i, "text": " ".join(words)})
    return rd.from_items(rows)


def test_exact_dedup(ray_session):
    from raysketch.dedup import exact_dedup
    ds = _docs_with_dups(ray_session)
    out = exact_dedup(ds, "text", "doc_id").to_pandas()
    assert len(out) == 65  # 60 base + 5 near-dups survive
    assert set(out["doc_id"]) == set(range(60)) | {200, 201, 202, 203, 204}


def test_minhash_lsh_finds_planted_neardups(ray_session):
    from raysketch.dedup import minhash_lsh_pairs
    ds = _docs_with_dups(ray_session)
    pairs = minhash_lsh_pairs(ds, "text", "doc_id", num_perm=128, bands=32,
                              threshold=0.5)
    found = set(map(tuple, pairs[["doc_a", "doc_b"]].values))
    # exact dups must be found with est_jaccard ~1
    for i in range(5):
        assert (i, 100 + i) in found
    exact_rows = pairs[pairs["doc_b"] >= 100]
    exact_rows = exact_rows[exact_rows["doc_b"] < 200]
    assert (exact_rows["est_jaccard"] > 0.99).all()
    # near-dups (3/60 words changed -> high jaccard) must be found
    near_found = sum((10 + i, 200 + i) in found for i in range(5))
    assert near_found >= 4
    # unrelated random docs must NOT pair up
    base_pairs = [p for p in found if p[0] < 60 and p[1] < 60]
    assert len(base_pairs) == 0


def test_simhash_finds_exact_and_near(ray_session):
    from raysketch.dedup import simhash_pairs
    ds = _docs_with_dups(ray_session)
    pairs = simhash_pairs(ds, "text", "doc_id", max_hamming=6)
    found = set(map(tuple, pairs[["doc_a", "doc_b"]].values))
    for i in range(5):
        assert (i, 100 + i) in found  # exact dup -> hamming 0
    ham0 = pairs[(pairs["doc_a"] < 60) & (pairs["doc_b"] >= 100)
                 & (pairs["doc_b"] < 200)]
    assert (ham0["hamming"] == 0).all()


def test_minhash_hot_bucket_still_finds_dups(ray_session):
    """A bucket above the hot cap must be chunked (salted per band), not
    silently dropped: identical docs in a 60-member bucket with cap=20
    still produce plenty of verified est_jaccard=1.0 pairs."""
    import ray.data as rd
    from raysketch.dedup import minhash_lsh_pairs
    rows = [{"doc_id": i, "text": "the same boilerplate text repeated "
             "over and over for every page footer"} for i in range(60)]
    # plus unrelated filler so the corpus isn't a single bucket
    rng = np.random.default_rng(9)
    vocab = [f"w{i}" for i in range(300)]
    rows += [{"doc_id": 1000 + i,
              "text": " ".join(rng.choice(vocab, 40).tolist())}
             for i in range(20)]
    pairs = minhash_lsh_pairs(rd.from_items(rows), "text", "doc_id",
                              num_perm=64, bands=16, threshold=0.9,
                              hot_cap=20)
    dup_pairs = pairs[(pairs["doc_a"] < 60) & (pairs["doc_b"] < 60)]
    # per band: 3 chunks of 20 -> 570 within-chunk pairs; bands use
    # different salts so the union across 16 bands is much larger
    assert len(dup_pairs) >= 570
    assert (dup_pairs["est_jaccard"] == 1.0).all()


def test_minhash_verify_multiblock_parity(ray_session):
    """The distributed signature-join verify must give identical pairs
    regardless of block partitioning."""
    import ray.data as rd
    from raysketch.dedup import minhash_lsh_pairs
    ds = _docs_with_dups(ray_session)
    one = minhash_lsh_pairs(ds, "text", "doc_id", num_perm=128, bands=32,
                            threshold=0.5, num_partitions=1)
    many = minhash_lsh_pairs(ds.repartition(13), "text", "doc_id",
                             num_perm=128, bands=32, threshold=0.5,
                             num_partitions=7)
    assert one[["doc_a", "doc_b"]].values.tolist() == \
        many[["doc_a", "doc_b"]].values.tolist()
    assert np.allclose(one["est_jaccard"], many["est_jaccard"])


def test_exact_dedup_multiblock(ray_session):
    """Semi-join winner filtering (no driver broadcast) across many
    blocks/partitions."""
    from raysketch.dedup import exact_dedup
    ds = _docs_with_dups(ray_session).repartition(11)
    out = exact_dedup(ds, "text", "doc_id", num_partitions=5).to_pandas()
    assert set(out["doc_id"]) == set(range(60)) | {200, 201, 202, 203, 204}


def test_embedding_hot_bucket(ray_session):
    """An oversized embedding bucket is verified per chunk, not dropped."""
    import ray.data as rd
    from raysketch.dedup import embedding_neardup_pairs
    rng = np.random.default_rng(5)
    v = rng.standard_normal(16)
    rows = [{"vec_id": i,
             "embedding": (v + rng.standard_normal(16) * 1e-3).tolist()}
            for i in range(30)]
    pairs = embedding_neardup_pairs(rd.from_items(rows), "embedding",
                                    "vec_id", threshold=0.999, bits=4,
                                    cap=10)
    # 30 near-identical vectors in one bucket, cap 10 -> 3 chunks of 10
    # -> at least 3 * C(10,2) = 135 verified pairs
    assert len(pairs) >= 135
    assert (pairs["cosine"] >= 0.999).all()


def test_embedding_neardup(ray_session):
    import ray.data as rd
    from raysketch.dedup import embedding_neardup_pairs
    rng = np.random.default_rng(11)
    base = rng.standard_normal((40, 32))
    rows = [{"vec_id": i, "embedding": base[i].tolist()} for i in range(40)]
    # planted near-dups: tiny perturbation of vecs 0..4
    for i in range(5):
        v = base[i] + rng.standard_normal(32) * 0.01
        rows.append({"vec_id": 100 + i, "embedding": v.tolist()})
    ds = rd.from_items(rows)
    pairs = embedding_neardup_pairs(ds, "embedding", "vec_id",
                                    threshold=0.99, bits=8)
    found = set(map(tuple, pairs[["doc_a", "doc_b"]].values))
    hits = sum((i, 100 + i) in found for i in range(5))
    assert hits >= 4  # LSH with one table: allow one recall miss
    # no false pairs among independent gaussians
    assert all(a >= 100 or b >= 100 for a, b in found)


def test_neardup_dedup_transitive_clusters(ray_session):
    """neardup_dedup must collapse CONNECTED COMPONENTS: a chain
    T0~T1~T2 where only adjacent pairs are near-dups still keeps exactly
    one representative (the min id), and isolated docs all survive."""
    import ray.data as rd
    from raysketch.dedup import neardup_dedup
    rng = np.random.default_rng(23)
    vocab = [f"w{i}" for i in range(800)]
    rows = []
    # 30 isolated random docs
    for i in range(30):
        rows.append({"doc_id": i,
                     "text": " ".join(rng.choice(vocab, 80).tolist())})
    # 5 chains of 3: T0 -> change first 8 words -> change last 8 words
    for c in range(5):
        words = rng.choice(vocab, 80).tolist()
        t0 = list(words)
        t1 = list(t0)
        t1[:8] = [f"x{c}_{j}" for j in range(8)]
        t2 = list(t1)
        t2[-8:] = [f"y{c}_{j}" for j in range(8)]
        rows.append({"doc_id": 100 + c * 10, "text": " ".join(t0)})
        rows.append({"doc_id": 101 + c * 10, "text": " ".join(t1)})
        rows.append({"doc_id": 102 + c * 10, "text": " ".join(t2)})
    out = neardup_dedup(rd.from_items(rows), "text", "doc_id",
                        threshold=0.5).to_pandas()
    kept = set(out["doc_id"])
    # every isolated doc survives
    assert set(range(30)) <= kept
    # each chain keeps exactly its min id
    for c in range(5):
        chain = {100 + c * 10, 101 + c * 10, 102 + c * 10}
        assert kept & chain == {100 + c * 10}, (c, kept & chain)


def test_embedding_neardup_multiblock_parity(ray_session):
    """Multi-table LSH + distributed pair distinct must give identical
    pairs regardless of block partitioning (the minhash parity check,
    applied to the embedding path)."""
    import ray.data as rd
    from raysketch.dedup import embedding_neardup_pairs
    rng = np.random.default_rng(31)
    base = rng.standard_normal((50, 24))
    rows = [{"vec_id": i, "embedding": base[i].tolist()} for i in range(50)]
    for i in range(8):
        v = base[i] + rng.standard_normal(24) * 0.005
        rows.append({"vec_id": 100 + i, "embedding": v.tolist()})
    ds = rd.from_items(rows)
    one = embedding_neardup_pairs(ds, "embedding", "vec_id",
                                  threshold=0.99, bits=8, num_tables=2)
    many = embedding_neardup_pairs(ds.repartition(9), "embedding",
                                   "vec_id", threshold=0.99, bits=8,
                                   num_tables=2, shuffle_parts=17)
    assert one[["doc_a", "doc_b"]].values.tolist() == \
        many[["doc_a", "doc_b"]].values.tolist()
    assert np.allclose(one["cosine"], many["cosine"])
    found = set(map(tuple, one[["doc_a", "doc_b"]].values))
    # two independent tables: all 8 planted pairs should be recalled
    assert sum((i, 100 + i) in found for i in range(8)) >= 7


def test_embedding_multi_table_recall_beats_single(ray_session):
    """Pairs found by table 0 OR table 1 are a superset of table 0's
    pairs: adding hash tables can only add recall (same verify)."""
    import ray.data as rd
    from raysketch.dedup import embedding_neardup_pairs
    rng = np.random.default_rng(41)
    base = rng.standard_normal((60, 16))
    rows = [{"vec_id": i, "embedding": base[i].tolist()} for i in range(60)]
    for i in range(10):
        v = base[i] + rng.standard_normal(16) * 0.02
        rows.append({"vec_id": 200 + i, "embedding": v.tolist()})
    ds = rd.from_items(rows)
    single = embedding_neardup_pairs(ds, "embedding", "vec_id",
                                     threshold=0.98, bits=10, num_tables=1)
    double = embedding_neardup_pairs(ds, "embedding", "vec_id",
                                     threshold=0.98, bits=10, num_tables=2)
    s1 = set(map(tuple, single[["doc_a", "doc_b"]].values))
    s2 = set(map(tuple, double[["doc_a", "doc_b"]].values))
    assert s1 <= s2


def test_neardup_dedup_sparse_64bit_ids(ray_session):
    """Overflow regime of the old label-SUM convergence probe: huge sparse
    ids near 2^62 in a transitive chain.  The changed-count probe must
    converge to exactly one representative (the min id) per component."""
    import ray.data as rd
    from raysketch.dedup import neardup_dedup
    rng = np.random.default_rng(53)
    vocab = [f"w{i}" for i in range(800)]
    big = 1 << 62
    rows = []
    for i in range(20):  # isolated docs at huge ids
        rows.append({"doc_id": big + 7919 * i,
                     "text": " ".join(rng.choice(vocab, 80).tolist())})
    # one 3-chain at huge sparse ids
    words = rng.choice(vocab, 80).tolist()
    t0 = list(words)
    t1 = list(t0); t1[:8] = [f"x{j}" for j in range(8)]
    t2 = list(t1); t2[-8:] = [f"y{j}" for j in range(8)]
    ids = [big + 10**9, big + 2 * 10**9, big + 3 * 10**9]
    for did, t in zip(ids, (t0, t1, t2)):
        rows.append({"doc_id": did, "text": " ".join(t)})
    out = neardup_dedup(rd.from_items(rows), "text", "doc_id",
                        threshold=0.5).to_pandas()
    kept = set(out["doc_id"])
    assert {big + 7919 * i for i in range(20)} <= kept
    assert kept & set(ids) == {ids[0]}


def test_neardup_dedup_nonconvergence_warns(ray_session):
    """A component wider than max_iters hops must surface a
    RuntimeWarning (never a silent stdout print) and keep extra
    representatives, never lose rows."""
    import warnings

    import ray.data as rd
    from raysketch.dedup import neardup_dedup
    rng = np.random.default_rng(61)
    vocab = [f"w{i}" for i in range(900)]
    # one long chain: doc k+1 = doc k with 6 of 80 words changed
    words = rng.choice(vocab, 80).tolist()
    rows = [{"doc_id": 0, "text": " ".join(words)}]
    cur = list(words)
    for k in range(1, 9):
        cur = list(cur)
        cur[(6 * k) % 70:(6 * k) % 70 + 6] = [f"c{k}_{j}" for j in range(6)]
        rows.append({"doc_id": k, "text": " ".join(cur)})
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        out = neardup_dedup(rd.from_items(rows), "text", "doc_id",
                            threshold=0.5, max_iters=1).to_pandas()
    assert any("max_iters" in str(w.message) for w in rec)
    # one propagation round cannot collapse an 8-hop chain to one id,
    # but no row may vanish: every survivor is a real doc and doc 0 stays
    assert 0 in set(out["doc_id"])
    assert set(out["doc_id"]) <= set(range(9))


def test_pairs_collect_false_dataset_contract(ray_session, tmp_path):
    """collect=False returns a DISTRIBUTED pair Dataset (never a driver
    DataFrame) whose rows equal the collected result, and the Dataset can
    be streamed to a resumable partitioned sink without driver
    collection -- the 100-TB contract for pair outputs."""
    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data as rd
    from raysketch.dedup import minhash_lsh_pairs, simhash_pairs
    from raysketch.pipeline import resumable_write

    ds = _docs_with_dups(ray_session)
    df = minhash_lsh_pairs(ds, "text", "doc_id", num_perm=128, bands=32,
                           threshold=0.5)
    pairs_ds = minhash_lsh_pairs(ds, "text", "doc_id", num_perm=128,
                                 bands=32, threshold=0.5, collect=False)
    assert isinstance(pairs_ds, rd.Dataset)
    got = (pairs_ds.to_pandas().sort_values(["doc_a", "doc_b"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, df)

    out_dir = str(tmp_path / "pairs")
    manifest = resumable_write(pairs_ds, out_dir, "doc_a", num_shards=4)
    assert manifest["n_rows"].sum() == len(df)
    import glob
    files = sorted(glob.glob(out_dir + "/shard_*.parquet"))
    back = pd.concat([pq.read_table(f).to_pandas() for f in files])
    back = back.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(back[df.columns.tolist()], df)

    # simhash: Dataset contract on the no-candidate path too
    empty = simhash_pairs(rd.from_items(
        [{"doc_id": 1, "text": "alpha beta"},
         {"doc_id": 2, "text": "totally different words here"}]),
        "text", "doc_id", max_hamming=0, collect=False)
    assert isinstance(empty, rd.Dataset)
    assert empty.count() == 0
    assert set(empty.schema().names) == {"doc_a", "doc_b", "hamming"}


def test_embedding_pairs_collect_false(ray_session):
    """embedding_neardup_pairs collect=False: Dataset rows match the
    collected DataFrame (same pairs, same cosines)."""
    import ray.data as rd
    from raysketch.dedup import embedding_neardup_pairs
    rng = np.random.default_rng(17)
    base = rng.standard_normal((40, 16))
    rows = [{"vec_id": i, "embedding": base[i].tolist()} for i in range(40)]
    for i in range(6):
        v = base[i] + rng.standard_normal(16) * 0.01
        rows.append({"vec_id": 300 + i, "embedding": v.tolist()})
    ds = rd.from_items(rows)
    df = embedding_neardup_pairs(ds, "embedding", "vec_id", threshold=0.98,
                                 bits=8, num_tables=2)
    got = embedding_neardup_pairs(ds, "embedding", "vec_id", threshold=0.98,
                                  bits=8, num_tables=2, collect=False)
    assert isinstance(got, rd.Dataset)
    got_df = (got.to_pandas().sort_values(["doc_a", "doc_b"])
              .reset_index(drop=True))
    import pandas as pd
    pd.testing.assert_frame_equal(got_df, df)
    assert len(df) >= 5  # planted near-dups found
