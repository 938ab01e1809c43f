"""Example 5 — deep latent Gaussian model (DLGM) with a VAE-style amortized
guide, plus the 1024-sharded-chain NUTS variant.

Blueprint: SURVEY.md C20 (BASELINE.json configs[4]: "Deep latent Gaussian
model (VAE-style amortized guide), 1024 sharded NUTS chains on pod slice").

This is the flagship model: the decoder/encoder MLPs are the MXU-heavy
compute (batched bf16-friendly matmuls), local latents z ride the plate
subsampling machinery, decoder weights are `param` sites optimized jointly
with the ELBO, and the NUTS variant shards 1024 chains over the mesh's
``chain`` axis (SURVEY.md C13a) to measure effective-samples/s.

Amortized-guide scaling note: the model scales the in-plate prior and
likelihood terms by N/B, so the guide scales log q(z|x) by the same factor —
the estimator stays an unbiased mini-batch ELBO.

Run: ``python -m bayesic_tpu.models.dlgm --smoke true``
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from .. import dist
from ..core import param, plate, sample
from ..dist import constraints
from ..infer.mcmc import MCMC
from ..infer.svi import SVI, NeuralGuide
from ..utils import diagnostics as diag
from ..utils.config import dump_config, parse_config
from .common import bench_line, timed_steps

_LOG_2PI = float(np.log(2.0 * np.pi))


@dataclasses.dataclass(frozen=True)
class Config:
    num_data: int = 10_000
    data_dim: int = 32
    latent_dim: int = 8
    hidden: int = 64
    batch_size: int = 256
    steps: int = 3000
    lr: float = 1e-3
    seed: int = 0
    # NUTS variant
    num_chains: int = 64
    nuts_batch: int = 4
    num_warmup: int = 300
    num_samples: int = 300
    smoke: bool = False
    bench: bool = False
    compute_dtype: str = "float32"   # "bfloat16" for MXU fast path


class Decoder(nn.Module):
    data_dim: int
    hidden: int
    dtype: Any = jnp.float32    # bf16 compute puts the matmuls on the MXU
                                # fast path; params stay f32

    @nn.compact
    def __call__(self, z):
        h = nn.tanh(nn.Dense(self.hidden, dtype=self.dtype)(z))
        return nn.Dense(self.data_dim, dtype=self.dtype)(h) \
            .astype(jnp.float32)


class Encoder(nn.Module):
    latent_dim: int
    hidden: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.tanh(nn.Dense(self.hidden, dtype=self.dtype)(x))
        mu = nn.Dense(self.latent_dim, dtype=self.dtype)(h) \
            .astype(jnp.float32)
        log_sigma = nn.Dense(self.latent_dim, dtype=self.dtype)(h) \
            .astype(jnp.float32)
        return mu, jnp.clip(log_sigma, -6.0, 3.0)


def make_data(cfg: Config):
    """Synthetic data from a random ground-truth DLGM."""
    rng = np.random.default_rng(cfg.seed)
    w1 = rng.normal(0, 1, (cfg.latent_dim, cfg.hidden)) / np.sqrt(
        cfg.latent_dim)
    w2 = rng.normal(0, 1, (cfg.hidden, cfg.data_dim)) / np.sqrt(cfg.hidden)
    z = rng.normal(0, 1, (cfg.num_data, cfg.latent_dim))
    x = np.tanh(z @ w1) @ w2 + rng.normal(0, 0.3, (cfg.num_data,
                                                   cfg.data_dim))
    return jnp.asarray(x.astype(np.float32))


def make_model_and_guide(cfg: Config, x):
    n = int(x.shape[0])
    cdtype = jnp.dtype(cfg.compute_dtype)
    dec = Decoder(cfg.data_dim, cfg.hidden, dtype=cdtype)
    enc = Encoder(cfg.latent_dim, cfg.hidden, dtype=cdtype)
    key0 = jax.random.PRNGKey(cfg.seed)
    dec_init = dec.init(key0, jnp.zeros((1, cfg.latent_dim)))
    b = cfg.batch_size
    scale = n / b

    def model(xa):
        dec_params = param("decoder", init_value=dec_init)
        sigma_x = param("sigma_x", init_value=jnp.asarray(0.5),
                        constraint=constraints.positive)
        with plate("data", n, subsample_size=b) as idx:
            xb = xa[idx]
            z = sample(
                "z", dist.Normal(0.0, 1.0).expand((b, cfg.latent_dim))
                .to_event(2)
            )
            mu = dec.apply(dec_params, z)
            sample("obs", dist.Normal(mu, sigma_x).to_event(2), obs=xb)

    def guide_init(key):
        return enc.init(key, jnp.zeros((1, cfg.data_dim)))

    def guide_sample(params, key, sample_shape, stop_gradient_q, ctx):
        sub = (ctx or {}).get("subsample") or {}
        idx = sub.get("data__idx", jnp.arange(b))
        margs = (ctx or {}).get("model_args")
        xa = margs[0] if margs else x
        xb = xa[idx]
        mu, log_sig = enc.apply(params, xb)            # (b, dz)
        eps = jax.random.normal(
            key, tuple(sample_shape) + mu.shape, mu.dtype
        )
        z = mu + jnp.exp(log_sig) * eps
        if stop_gradient_q:
            mu_q, log_sig_q = jax.lax.stop_gradient((mu, log_sig))
        else:
            mu_q, log_sig_q = mu, log_sig
        zz = (z - mu_q) * jnp.exp(-log_sig_q)
        logq = jnp.sum(-0.5 * zz * zz - log_sig_q - 0.5 * _LOG_2PI,
                       axis=(-2, -1))
        # match the model-side N/B plate scaling (unbiased mini-batch ELBO)
        return {"z": z}, scale * logq

    return model, NeuralGuide(guide_init, guide_sample), dec, enc


def run_svi(cfg: Config, key=None, data_sharding=None):
    key = key if key is not None else jax.random.PRNGKey(cfg.seed)
    x = make_data(cfg)
    if data_sharding is not None:
        x = jax.device_put(x, data_sharding)
    model, guide, dec, enc = make_model_and_guide(cfg, x)
    svi = SVI(model, guide, optax.adam(cfg.lr), model_args=(x,))

    if cfg.bench:
        state = svi.init(key)
        _, dt = timed_steps(
            lambda s: svi.run(key, cfg.steps, state=s, model_args=(x,)),
            state,
        )
        bench_line("elbo_steps_per_s", cfg.steps / dt, "steps/s",
                   model="dlgm", n=cfg.num_data, batch=cfg.batch_size)
    res = svi.run(key, cfg.steps, model_args=(x,))
    mp = svi.model_params(res.params)
    return {
        "svi": svi,
        "result": res,
        "x": x,
        "decoder": dec,
        "encoder": enc,
        "decoder_params": mp["decoder"],
        "sigma_x": float(mp["sigma_x"]),
        "final_elbo": -float(res.losses[-1]),
        "losses": np.asarray(res.losses),
        "guide_params": svi.guide_params(res.params),
    }


def fused_init(cfg: Config, key):
    """Initialize fused-trainer leaves (ops/fused_vae.LEAVES layout) with
    the same distributions flax uses (lecun-normal kernels, zero biases)
    and the same sigma_x init (0.5) as the `param` site in `model`."""
    from ..ops import fused_vae as fv

    shapes = fv.leaf_shapes(
        fv.FusedVAEDims(cfg.num_data, cfg.data_dim, cfg.hidden,
                        cfg.latent_dim, cfg.batch_size))
    params, m, v = {}, {}, {}
    for i, name in enumerate(fv.LEAVES):
        s = shapes[name]
        if name == "usig":
            params[name] = jnp.full(s, float(np.log(0.5)))
        elif name.startswith("w"):
            params[name] = (jax.random.truncated_normal(
                jax.random.fold_in(key, i), -2.0, 2.0, s)
                / np.sqrt(s[0]))
        else:
            params[name] = jnp.zeros(s)
        m[name] = jnp.zeros(s)
        v[name] = jnp.zeros(s)
    return params, m, v


def fused_to_flax(params):
    """Fused decoder leaves -> the flax Decoder param pytree (so recon /
    NUTS reuse works on fused-trained parameters)."""
    return {"params": {
        "Dense_0": {"kernel": params["w1d"], "bias": params["b1d"][0]},
        "Dense_1": {"kernel": params["w2d"], "bias": params["b2d"][0]},
    }}


def run_svi_fused(cfg: Config, key=None):
    """Whole-run-in-VMEM Pallas trainer (ops/fused_vae.py): same model,
    same estimator, one kernel launch for all `cfg.steps` steps."""
    from ..ops import fused_vae as fv

    key = key if key is not None else jax.random.PRNGKey(cfg.seed)
    x = make_data(cfg)
    params, m, v = fused_init(cfg, key)
    seed = int(jax.random.randint(jax.random.fold_in(key, 7), (),
                                  0, 2**31 - 1))
    # VMEM-resident exact gather when the (lane-padded) dataset fits;
    # HBM block sampling (one-time shuffle) otherwise
    vmem_bytes = cfg.num_data * max(cfg.data_dim, 128) * 4
    gather = "onehot" if vmem_bytes <= 6 * 2**20 else "block"
    if gather == "block":
        perm = jax.random.permutation(jax.random.fold_in(key, 8),
                                      cfg.num_data)
        x = x[perm]
    params, m, v, losses = fv.fused_train(
        x, params, m, v, steps=cfg.steps, lr=cfg.lr, seed=seed,
        batch=cfg.batch_size, gather=gather,
        interpret=jax.default_backend() != "tpu")
    sigma_x = float(jnp.exp(params["usig"][0, 0]))
    return {
        "x": x,
        "params": params,
        "decoder_params": fused_to_flax(params),
        "sigma_x": sigma_x,
        "final_elbo": -float(losses[-1]),
        "losses": np.asarray(losses),
        "opt_state": (m, v),
    }


def local_posterior_mcmc(cfg: Config, dec, dec_params, sigma_x, x_batch,
                         key, chain_sharding=None, shared_adapt=None):
    """NUTS over the local latents z for a fixed decoder — the
    1024-sharded-chain workload of configs[4]."""
    nb = int(x_batch.shape[0])

    def model():
        z = sample(
            "z", dist.Normal(0.0, 1.0).expand((nb, cfg.latent_dim))
            .to_event(2)
        )
        mu = dec.apply(dec_params, z)
        sample("obs", dist.Normal(mu, sigma_x).to_event(2), obs=x_batch)

    if shared_adapt is None:
        # pooled adaptation is the right default once chains are many
        shared_adapt = cfg.num_chains >= 64
    mcmc = MCMC(model=model, num_warmup=cfg.num_warmup,
                num_samples=cfg.num_samples, num_chains=cfg.num_chains,
                chain_sharding=chain_sharding, init_step_size=0.2,
                shared_adapt=shared_adapt)
    return mcmc, mcmc.run(key)


def local_posterior_mcmc_fused(cfg: Config, dec, dec_params, sigma_x,
                               x_batch, *, max_doublings=6,
                               block_chains=64, mm_dtype="split",
                               interpret=False, run_key=None):
    """The configs[4] local-posterior NUTS workload routed through the
    fused Pallas transition (ops/fused_nuts.py): the same model density and
    the same MCMC driver (pooled adaptation, Welford windows, diagnostics)
    with the per-transition tree build running as one VMEM-resident kernel
    launch.  Returns the MCMC object (call ``.run(key)`` / bench it)."""
    from ..ops.fused_nuts import make_batched_transition

    nb = int(x_batch.shape[0])

    def model():
        z = sample(
            "z", dist.Normal(0.0, 1.0).expand((nb, cfg.latent_dim))
            .to_event(2)
        )
        mu = dec.apply(dec_params, z)
        sample("obs", dist.Normal(mu, sigma_x).to_event(2), obs=x_batch)

    block_chains = min(block_chains, cfg.num_chains)
    if cfg.num_chains % block_chains:
        raise ValueError("block_chains must divide num_chains")
    bt = make_batched_transition(
        dec_params, float(sigma_x), x_batch, latent_dim=cfg.latent_dim,
        hidden=cfg.hidden, max_doublings=max_doublings,
        block_chains=block_chains, mm_dtype=mm_dtype, interpret=interpret)
    mcmc = MCMC(model=model, num_warmup=cfg.num_warmup,
                num_samples=cfg.num_samples, num_chains=cfg.num_chains,
                init_step_size=0.2, shared_adapt=True,
                batched_transition=bt)
    if run_key is not None:
        return mcmc, mcmc.run(run_key)
    return mcmc


def run(cfg: Config, key=None):
    if cfg.smoke:
        cfg = dataclasses.replace(
            cfg, num_data=512, data_dim=8, latent_dim=3, hidden=16,
            batch_size=64, steps=300, num_chains=8, num_warmup=100,
            num_samples=100, nuts_batch=2,
        )
    out = run_svi(cfg, key)
    # reconstruction check
    x = out["x"]
    mu_z, _ = out["encoder"].apply(out["guide_params"], x[:256])
    recon = out["decoder"].apply(out["decoder_params"], mu_z)
    out["recon_rmse"] = float(jnp.sqrt(jnp.mean((recon - x[:256]) ** 2)))

    # NUTS variant on a small batch
    kb = jax.random.PRNGKey(cfg.seed + 1)
    _, mres = local_posterior_mcmc(
        cfg, out["decoder"], out["decoder_params"], out["sigma_x"],
        x[:cfg.nuts_batch], kb,
    )
    z = mres.samples["z"]
    z2 = z.reshape(z.shape[0], z.shape[1], -1)
    summ = diag.ess(z2)
    out["nuts_min_ess"] = float(jnp.min(summ))
    out["nuts_divergences"] = int(mres.extra["diverging"].sum())
    return out


def main(argv=None):
    cfg = parse_config(Config, argv)
    print(dump_config(cfg))
    out = run(cfg)
    print(f"final ELBO = {out['final_elbo']:.1f}")
    print(f"sigma_x = {out['sigma_x']:.3f} (true 0.3)")
    print(f"recon RMSE = {out['recon_rmse']:.3f}")
    print(f"NUTS z-posterior: min ESS = {out['nuts_min_ess']:.0f}, "
          f"divergences = {out['nuts_divergences']}")


if __name__ == "__main__":
    main()
