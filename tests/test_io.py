"""Native data-loader tests: roundtrip, shards, prefetch batches, and
native == numpy-fallback equivalence of the public surface."""

import numpy as np
import pytest

from bayesic_tpu.io import RatingsDataset, native_available, write_ratings


@pytest.fixture
def ratings_file(tmp_path):
    rng = np.random.default_rng(0)
    n = 10_000
    users = rng.integers(0, 500, n).astype(np.int32)
    items = rng.integers(0, 200, n).astype(np.int32)
    vals = rng.normal(3.5, 1.0, n).astype(np.float32)
    path = str(tmp_path / "ratings.btpr")
    write_ratings(path, users, items, vals)
    return path, users, items, vals


def test_native_toolchain_builds():
    assert native_available(), "g++ build of the native loader failed"


@pytest.mark.parametrize("use_native", [True, False])
def test_roundtrip_and_shards(ratings_file, use_native):
    path, users, items, vals = ratings_file
    if use_native and not native_available():
        pytest.skip("no native build")
    with RatingsDataset(path, use_native=use_native) as ds:
        assert len(ds) == users.shape[0]
        u, i, r = ds.read_shard(0, len(ds))
        np.testing.assert_array_equal(u, users)
        np.testing.assert_array_equal(i, items)
        np.testing.assert_array_equal(r, vals)
        # host shard (second half)
        u2, i2, r2 = ds.read_shard(5000, 5000)
        np.testing.assert_array_equal(u2, users[5000:])
        np.testing.assert_array_equal(r2, vals[5000:])
        with pytest.raises(IndexError):
            ds.read_shard(9000, 2000)


@pytest.mark.parametrize("use_native", [True, False])
def test_batches_are_valid_samples(ratings_file, use_native):
    path, users, items, vals = ratings_file
    if use_native and not native_available():
        pytest.skip("no native build")
    lookup = {}
    for u, i, r in zip(users, items, vals):
        lookup.setdefault(int(u), set()).add(
            (int(i), np.float32(r).tobytes())
        )
    with RatingsDataset(path, use_native=use_native) as ds:
        it = ds.batches(256, seed=7)
        seen_means = []
        for _ in range(20):
            u, i, r = next(it)
            assert u.shape == (256,)
            # every sampled triple exists in the dataset
            for k in range(0, 256, 64):
                assert (int(i[k]), np.float32(r[k]).tobytes()) in \
                    lookup[int(u[k])]
            seen_means.append(r.mean())
        # sampling is uniform-ish: batch means hover around global mean
        assert abs(np.mean(seen_means) - vals.mean()) < 0.1


def test_bad_file_rejected(tmp_path):
    p = tmp_path / "junk.btpr"
    p.write_bytes(b"not a ratings file at all....")
    with pytest.raises(IOError):
        RatingsDataset(str(p), use_native=False)
    if native_available():
        with pytest.raises(IOError):
            RatingsDataset(str(p), use_native=True)


def test_metrics_logger_jsonl_and_tensorboard(tmp_path):
    """SURVEY.md §5: JSONL emitter + optional TensorBoard scalar writer."""
    import glob
    import json as _json

    from bayesic_tpu.utils.metrics import MetricsLogger

    jl = tmp_path / "m.jsonl"
    tb = tmp_path / "tb"
    m = MetricsLogger(path=str(jl), tensorboard_dir=str(tb), enabled=True)
    m.log(1, loss=3.25)
    m.log(2, loss=2.5, note="warm")
    m.close()

    lines = [_json.loads(l) for l in jl.read_text().splitlines()]
    assert [r["step"] for r in lines] == [1, 2]
    assert lines[1]["note"] == "warm"
    assert glob.glob(str(tb / "*")), "no TensorBoard event file written"
