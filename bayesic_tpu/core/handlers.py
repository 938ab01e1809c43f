"""Effect handlers: seed / trace / substitute / condition / scale / block.

Blueprint: SURVEY.md C3 — the interception layer that turns a plain Python
model function into (a) a recorded site graph (``trace``), (b) a replayable
density (``substitute`` + ``trace``), and (c) a seeded generative sampler
(``seed``).  Pattern follows the composable-effects PPL design (PAPERS.md,
NumPyro paper) re-implemented from scratch for this engine.
"""

from __future__ import annotations

from collections import OrderedDict

import jax
import jax.numpy as jnp

from .primitives import HANDLER_STACK

__all__ = ["Handler", "seed", "trace", "substitute", "condition", "scale",
           "block", "uncondition", "mask"]


class Handler:
    """Base effect handler; wraps a callable and interposes on messages while
    the wrapped call is executing."""

    def __init__(self, fn=None):
        self.fn = fn

    def __enter__(self):
        HANDLER_STACK.append(self)
        return self

    def __exit__(self, *exc):
        assert HANDLER_STACK[-1] is self
        HANDLER_STACK.pop()
        return False

    def __call__(self, *args, **kwargs):
        with self:
            return self.fn(*args, **kwargs)

    def process_message(self, msg):
        pass

    def postprocess_message(self, msg):
        pass


class seed(Handler):
    """Provide fresh PRNG keys to sample/subsample sites from a root key.

    Keys are derived with ``jax.random.fold_in(root, site_counter)`` in site
    order — deterministic given the root key, independent across sites, and
    stable under jit retracing (SURVEY.md §7 hard-part 3)."""

    def __init__(self, fn=None, rng_key=None):
        super().__init__(fn)
        if rng_key is None:
            raise ValueError("seed needs rng_key")
        self.rng_key = rng_key
        self._counter = 0

    def __enter__(self):
        self._counter = 0
        return super().__enter__()

    def process_message(self, msg):
        if msg["type"] in ("sample", "subsample") and msg["value"] is None \
                and msg["key"] is None:
            msg["key"] = jax.random.fold_in(self.rng_key, self._counter)
            self._counter += 1


class trace(Handler):
    """Record every message into an OrderedDict keyed by site name."""

    def __enter__(self):
        self.sites = OrderedDict()
        return super().__enter__()

    def postprocess_message(self, msg):
        name = msg["name"]
        if name in self.sites:
            raise ValueError(f"duplicate site name {name!r}")
        self.sites[name] = msg.copy()

    def get_trace(self, *args, **kwargs):
        self(*args, **kwargs)
        return self.sites


class substitute(Handler):
    """Force site values from ``data`` (dict name -> value). Applies to
    sample, subsample, and param sites; observedness is unchanged."""

    def __init__(self, fn=None, data=None):
        super().__init__(fn)
        self.data = data or {}

    def process_message(self, msg):
        if msg["type"] in ("sample", "subsample", "param") \
                and msg["name"] in self.data and msg["value"] is None:
            msg["value"] = self.data[msg["name"]]
            msg["is_substituted"] = True


class condition(Handler):
    """Like substitute but marks the site observed (likelihood term)."""

    def __init__(self, fn=None, data=None):
        super().__init__(fn)
        self.data = data or {}

    def process_message(self, msg):
        if msg["type"] == "sample" and msg["name"] in self.data \
                and msg["value"] is None:
            msg["value"] = self.data[msg["name"]]
            msg["is_observed"] = True


class scale(Handler):
    """Multiply log-density contributions of enclosed sites by ``factor``."""

    def __init__(self, fn=None, factor=1.0):
        super().__init__(fn)
        self.factor = factor

    def process_message(self, msg):
        if msg["type"] in ("sample", "factor"):
            msg["scale"] = msg["scale"] * self.factor


class uncondition(Handler):
    """Strip observations so likelihood sites resample from their
    distributions (posterior-predictive replay, infer/predictive.py)."""

    def process_message(self, msg):
        if msg["type"] == "sample" and msg["is_observed"]:
            msg["is_observed"] = False
            msg["value"] = None


class mask(Handler):
    """Elementwise-exclude density contributions where ``mask`` is False
    (ragged batches, censoring windows, padded data).  The mask broadcasts
    against each enclosed site's ``log_prob`` batch shape; nested masks
    compose by logical AND.  Sampling is unaffected — only the log-density
    terms are zeroed (SURVEY.md C3/C4 periphery)."""

    def __init__(self, fn=None, mask=None):
        super().__init__(fn)
        if mask is None:
            raise ValueError("mask handler needs mask=")
        self.mask = mask

    def process_message(self, msg):
        if msg["type"] in ("sample", "factor"):
            prev = msg.get("mask")
            msg["mask"] = self.mask if prev is None \
                else jnp.logical_and(prev, self.mask)


class block(Handler):
    """Hide matching sites from outer handlers (e.g. keep guide sites out of
    an outer model trace)."""

    def __init__(self, fn=None, hide_fn=None, hide=None):
        super().__init__(fn)
        if hide_fn is None:
            hide_set = set(hide or [])
            hide_fn = (lambda msg: msg["name"] in hide_set) if hide_set \
                else (lambda msg: True)
        self.hide_fn = hide_fn

    def process_message(self, msg):
        if self.hide_fn(msg):
            msg["stop"] = True
