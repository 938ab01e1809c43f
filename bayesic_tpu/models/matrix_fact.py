"""Example 3 — Bayesian matrix factorization, ~1M ratings, sharded
mini-batch ELBO.

Blueprint: SURVEY.md C18 (BASELINE.json configs[2]: "Bayesian matrix
factorization / latent-factor model, ~1M ratings, sharded mini-batch ELBO").

Latents: user/item factor matrices (TP-shardable over the ``model`` axis,
SURVEY.md C13c), user/item biases, global mean.  Likelihood terms are gathers
+ a batched dot — the hot op the Pallas ``mf_logprob`` kernel (C14b)
accelerates.  Mini-batch indices ride the plate subsampling machinery; the
rating arrays can be sharded over the ``data`` axis (C13d).

Run: ``python -m bayesic_tpu.models.matrix_fact --smoke true``
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .. import dist
from ..core import plate, sample
from ..infer.svi import SVI, MeanFieldGuide
from ..utils.config import dump_config, parse_config
from .common import bench_line, timed_steps


@dataclasses.dataclass(frozen=True)
class Config:
    num_users: int = 3000
    num_items: int = 1500
    num_factors: int = 16
    num_ratings: int = 1_000_000
    noise: float = 0.5
    seed: int = 0
    steps: int = 2000
    batch_size: int = 8192
    lr: float = 0.02
    smoke: bool = False
    bench: bool = False
    data_file: str = ""   # load ratings via the native mmap loader
                          # (bayesic_tpu.io); generated+written if missing


def make_data(cfg: Config):
    if cfg.data_file:
        return _data_from_file(cfg)
    return _synthetic_data(cfg)


def _data_from_file(cfg: Config):
    """Native-loader path (SURVEY.md C18 "sharded mini-batch ELBO" +
    native-runtime tier): mmap'd columnar file, host-shard reads."""
    import os

    from ..io import RatingsDataset, write_ratings

    if not os.path.exists(cfg.data_file):
        users, items, r, truth = _synthetic_data(cfg)
        write_ratings(cfg.data_file, np.asarray(users), np.asarray(items),
                      np.asarray(r))
    with RatingsDataset(cfg.data_file) as ds:
        import jax as _jax

        n = len(ds)
        nproc = _jax.process_count()
        per = n // nproc
        start = _jax.process_index() * per
        u, i, r = ds.read_shard(start, per)
    return (jnp.asarray(u), jnp.asarray(i), jnp.asarray(r), None)


def _synthetic_data(cfg: Config):
    rng = np.random.default_rng(cfg.seed)
    u_true = rng.normal(0, 0.5, (cfg.num_users, cfg.num_factors)) \
        .astype(np.float32)
    v_true = rng.normal(0, 0.5, (cfg.num_items, cfg.num_factors)) \
        .astype(np.float32)
    bu = rng.normal(0, 0.3, cfg.num_users).astype(np.float32)
    bi = rng.normal(0, 0.3, cfg.num_items).astype(np.float32)
    m = np.float32(3.5)
    users = rng.integers(0, cfg.num_users, cfg.num_ratings).astype(np.int32)
    items = rng.integers(0, cfg.num_items, cfg.num_ratings).astype(np.int32)
    mean = (u_true[users] * v_true[items]).sum(-1) + bu[users] + bi[items] + m
    r = (mean + rng.normal(0, cfg.noise, cfg.num_ratings)).astype(np.float32)
    return (jnp.asarray(users), jnp.asarray(items), jnp.asarray(r),
            dict(u=u_true, v=v_true, bu=bu, bi=bi, m=m))


def make_model(cfg: Config):
    nu, ni, k = cfg.num_users, cfg.num_items, cfg.num_factors
    n = cfg.num_ratings
    noise = cfg.noise
    from ..ops.gather import mxu_gather

    def model(users, items, ratings):
        u = sample("u", dist.Normal(0.0, 1.0).expand((nu, k)).to_event(2))
        v = sample("v", dist.Normal(0.0, 1.0).expand((ni, k)).to_event(2))
        bu = sample("bu", dist.Normal(0.0, 0.5).expand((nu,)).to_event(1))
        bi = sample("bi", dist.Normal(0.0, 0.5).expand((ni,)).to_event(1))
        m = sample("m", dist.Normal(3.0, 1.0))
        with plate("ratings", n, subsample_size=cfg.batch_size) as idx:
            uid, iid = users[idx], items[idx]
            # MXU one-hot gathers: +52% step throughput on TPU (ops/gather)
            uu = mxu_gather(u, uid)
            vv = mxu_gather(v, iid)
            mean = (jnp.sum(uu * vv, -1) + mxu_gather(bu, uid)
                    + mxu_gather(bi, iid) + m)
            sample("obs", dist.Normal(mean, noise).to_event(1),
                   obs=ratings[idx])

    return model


def run(cfg: Config, key=None):
    if cfg.smoke:
        cfg = dataclasses.replace(
            cfg, num_users=50, num_items=30, num_factors=4,
            num_ratings=5000, steps=500, batch_size=512,
        )
    key = key if key is not None else jax.random.PRNGKey(cfg.seed)
    users, items, ratings, truth = make_data(cfg)
    if int(users.shape[0]) != cfg.num_ratings:
        cfg = dataclasses.replace(cfg, num_ratings=int(users.shape[0]))
    model = make_model(cfg)
    svi = SVI(model, MeanFieldGuide,
              optax.adam(optax.cosine_decay_schedule(cfg.lr, cfg.steps)),
              model_args=(users, items, ratings))

    if cfg.bench:
        state = svi.init(key)
        _, dt = timed_steps(lambda s: svi.run(key, cfg.steps, state=s),
                            state)
        bench_line("elbo_steps_per_s", cfg.steps / dt, "steps/s",
                   model="matrix_fact", ratings=cfg.num_ratings,
                   batch=cfg.batch_size, factors=cfg.num_factors)
    res = svi.run(key, cfg.steps, model_args=(users, items, ratings))

    # predictive check on held-in ratings (RMSE of posterior-mean predictor)
    mean_u, _ = svi.guide.stats(res.params)
    pred = (
        jnp.sum(mean_u["u"][users] * mean_u["v"][items], -1)
        + mean_u["bu"][users] + mean_u["bi"][items] + mean_u["m"]
    )
    rmse = float(jnp.sqrt(jnp.mean((pred - ratings) ** 2)))
    return {
        "rmse": rmse,
        "noise_floor": cfg.noise,
        "final_elbo": -float(res.losses[-1]),
        "losses": np.asarray(res.losses),
        "svi": svi,
        "params": res.params,
    }


def main(argv=None):
    cfg = parse_config(Config, argv)
    print(dump_config(cfg))
    out = run(cfg)
    print(f"train RMSE = {out['rmse']:.4f} (noise floor {out['noise_floor']})")
    print(f"final ELBO = {out['final_elbo']:.1f}")


if __name__ == "__main__":
    main()
