"""Moving-shapes video generator (on-device, jittable).

Reference data_generators/stochasticShapes.py:11-163 renders 32x32 videos
of a random shape (circle / rectangle / triangle) moving in a random
direction via matplotlib + HDF5. Here shapes are rasterized analytically on
device (signed-distance masks) and motion is computed in a scan — no
matplotlib, no HDF5, no host loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _raster(shape_id, cy, cx, size, image_size):
    """Soft raster of {0: circle, 1: square, 2: triangle} at (cy, cx)."""
    yy = jnp.arange(image_size, dtype=jnp.float32)[:, None]
    xx = jnp.arange(image_size, dtype=jnp.float32)[None, :]
    dy, dx = yy - cy, xx - cx
    circle = (jnp.sqrt(dy ** 2 + dx ** 2) <= size).astype(jnp.float32)
    square = ((jnp.abs(dy) <= size) & (jnp.abs(dx) <= size)).astype(jnp.float32)
    # upward triangle: inside y in [cy-size, cy+size], |dx| <= (dy+size)/2
    tri = ((dy >= -size) & (dy <= size) & (jnp.abs(dx) <= (dy + size) * 0.5)).astype(
        jnp.float32
    )
    return jnp.select(
        [shape_id == 0, shape_id == 1], [circle, square], tri
    )


@functools.partial(
    jax.jit, static_argnames=("seq_len", "image_size", "batch_size")
)
def sample_moving_shapes(key, *, seq_len: int = 10, image_size: int = 32,
                         batch_size: int = 8):
    """Returns frames [B,T,H,W,1] in [0,1]: one random shape per item moving
    with constant velocity, bouncing off walls."""
    ks, kp, kv, ksz = jax.random.split(key, 4)
    shape_id = jax.random.randint(ks, (batch_size,), 0, 3)
    size = jax.random.uniform(ksz, (batch_size,), minval=3.0, maxval=6.0)
    lo, hi = 6.0, image_size - 6.0
    pos = jax.random.uniform(kp, (batch_size, 2), minval=lo, maxval=hi)
    ang = jax.random.uniform(kv, (batch_size,), maxval=2 * jnp.pi)
    speed = jax.random.uniform(jax.random.fold_in(kv, 1), (batch_size,), minval=1.0,
                               maxval=3.0)
    vel = jnp.stack([jnp.sin(ang), jnp.cos(ang)], -1) * speed[:, None]

    def step(carry, _):
        pos, vel = carry
        new_pos = pos + vel
        bounce = (new_pos < 0.0) | (new_pos > image_size - 1.0)
        vel = jnp.where(bounce, -vel, vel)
        new_pos = jnp.clip(new_pos, 0.0, image_size - 1.0)
        return (new_pos, vel), new_pos

    _, traj = jax.lax.scan(step, (pos, vel), None, length=seq_len)  # [T,B,2]

    raster = jax.vmap(  # over time
        jax.vmap(_raster, in_axes=(0, 0, 0, 0, None)), in_axes=(None, 0, 0, None, None)
    )
    frames = raster(shape_id, traj[..., 0], traj[..., 1], size, image_size)
    return frames.swapaxes(0, 1)[..., None]


class MovingShapes:
    """Sampler facade matching the MovingMNIST interface."""

    def __init__(self, seq_len: int = 10, image_size: int = 32):
        self.seq_len = seq_len
        self.image_size = image_size

    def sample(self, key, batch_size: int):
        return sample_moving_shapes(
            key, seq_len=self.seq_len, image_size=self.image_size,
            batch_size=batch_size,
        )
