"""Attention-based peak-search head (reference admm_net.py:494-630).

phi -> [Re, Im] feature MLP -> cross-attention query against a learnable
(tau, f) positional grid -> per-target regression heads:
tau in [0,1] (sigmoid), f in [-0.5, 0.5] (tanh/2 -- see note), shared
confidence head.

NOTE: the reference's f_regressor ends in Tanh, whose range is (-1, 1), even
though the comment says f in [-0.5, 0.5] (admm_net.py:540-547).  We keep the
reference's actual behavior (plain tanh) for parity; the training data keeps
f in (-0.4, 0.4) so both parameterizations cover it.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def _grid_init(M: int, N: int):
    tau_grid = np.linspace(0.0, 1.0, M)
    f_grid = np.linspace(-0.5, 0.5, N)
    tg, fg = np.meshgrid(tau_grid, f_grid, indexing="ij")
    enc = np.stack([tg.ravel(), fg.ravel()], axis=1).astype(np.float32)

    def init(key, shape, dtype=jnp.float32):
        assert shape == enc.shape, (shape, enc.shape)
        return jnp.asarray(enc, dtype)

    return init


class PeakSearchHead(nn.Module):
    M: int
    N: int
    L_max: int = 3
    hidden_dim: int = 128
    num_heads: int = 4
    dropout: float = 0.1

    @nn.compact
    def __call__(self, phi, deterministic: bool = True):
        n = self.M * self.N
        x = jnp.concatenate([jnp.real(phi), jnp.imag(phi)], axis=-1)

        # 1. feature extraction
        x = nn.relu(nn.Dense(self.hidden_dim, name="feat1")(x))
        x = nn.relu(nn.Dense(self.hidden_dim, name="feat2")(x))

        # 2. learnable positional grid, projected
        pos = self.param("position_grid", _grid_init(self.M, self.N), (n, 2))
        pos = nn.Dense(self.hidden_dim, name="position_projection")(pos)
        pos = jnp.broadcast_to(pos, (*x.shape[:-1], n, self.hidden_dim))

        # 3. cross-attention: single query = features, keys/values = grid
        attended = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            dropout_rate=self.dropout,
            name="attention",
        )(
            inputs_q=x[..., None, :],
            inputs_kv=pos,
            deterministic=deterministic,
        )
        x = x + attended[..., 0, :]

        # 4. peak feature funnel
        for i, w in enumerate(
            (self.hidden_dim // 2, self.hidden_dim // 4, self.hidden_dim // 8)
        ):
            x = nn.relu(nn.Dense(w, name=f"peak{i}")(x))

        # 5. per-target heads with query offset t/L (reference admm_net.py:613-623)
        taus, fs, confs = [], [], []
        conf_h = nn.Dense(16, name="conf_hidden")
        conf_o = nn.Dense(1, name="conf_out")
        for t in range(self.L_max):
            feat = x + t / self.L_max
            th = nn.relu(nn.Dense(32, name=f"tau{t}_hidden")(feat))
            taus.append(nn.sigmoid(nn.Dense(1, name=f"tau{t}_out")(th)))
            fh = nn.relu(nn.Dense(32, name=f"f{t}_hidden")(feat))
            fs.append(jnp.tanh(nn.Dense(1, name=f"f{t}_out")(fh)))
            ch = nn.relu(conf_h(feat))
            confs.append(nn.sigmoid(conf_o(ch)))
        tau_est = jnp.concatenate(taus, axis=-1)
        f_est = jnp.concatenate(fs, axis=-1)
        conf = jnp.concatenate(confs, axis=-1)
        return tau_est, f_est, conf
