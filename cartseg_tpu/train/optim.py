"""Per-group AdamW with torch semantics, freeze-aware.

torch.optim.AdamW decouples weight decay as p -= lr*(adam_update + wd*p)
and, for a frozen group (requires_grad=False), neither moments nor step
counts advance. Mirrored here: each param leaf carries a group id
(encoder=0, decoder=1, head=2); the jitted update takes per-group
(lr, active) arrays each step, so phase switches and cosine epochs are
traced inputs — one compiled program for the whole run.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

GROUP_IDS = {"encoder": 0, "decoder": 1, "head": 2}


class AdamWState(NamedTuple):
    mu: Any
    nu: Any
    count: jnp.ndarray  # [3] per-group step counts


@jax.jit
def init_adamw(params) -> AdamWState:
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    return AdamWState(mu=zeros,
                      nu=jax.tree_util.tree_map(jnp.zeros_like, params),
                      count=jnp.zeros((3,), jnp.int32))


def group_id_tree(labels):
    """Label pytree ('encoder'|'decoder'|'head') -> int group ids."""
    return jax.tree_util.tree_map(lambda s: GROUP_IDS[s], labels)


def adamw_update(params, grads, state: AdamWState, gids,
                 lrs, active, weight_decay: float,
                 b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8):
    """lrs: [3] float learning rates; active: [3] float {0,1} (frozen
    groups get no moment/count updates and no param change)."""
    lrs = jnp.asarray(lrs, jnp.float32)
    active = jnp.asarray(active, jnp.float32)
    count = state.count + active.astype(jnp.int32)

    def upd(p, g, mu, nu, gid):
        a = active[gid]
        lr = lrs[gid]
        t = count[gid].astype(jnp.float32)
        mu2 = a * (b1 * mu + (1 - b1) * g) + (1 - a) * mu
        nu2 = a * (b2 * nu + (1 - b2) * g * g) + (1 - a) * nu
        t_safe = jnp.maximum(t, 1.0)
        mu_hat = mu2 / (1 - b1 ** t_safe)
        nu_hat = nu2 / (1 - b2 ** t_safe)
        step = mu_hat / (jnp.sqrt(nu_hat) + eps) + weight_decay * p
        p2 = p - a * lr * step
        return p2, mu2, nu2

    flat_p, treedef = jax.tree_util.tree_flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_mu = treedef.flatten_up_to(state.mu)
    flat_nu = treedef.flatten_up_to(state.nu)
    flat_id = treedef.flatten_up_to(gids)
    out = [upd(p, g, m, n, i) for p, g, m, n, i in
           zip(flat_p, flat_g, flat_mu, flat_nu, flat_id)]
    new_p = treedef.unflatten([o[0] for o in out])
    new_mu = treedef.unflatten([o[1] for o in out])
    new_nu = treedef.unflatten([o[2] for o in out])
    return new_p, AdamWState(mu=new_mu, nu=new_nu, count=count)
