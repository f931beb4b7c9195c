"""Probe which relayout primitives Mosaic supports on this TPU:
(a) jnp.reshape (64,4)->(1,256) inside a kernel,
(b) dot_general row-contraction transpose,
(c) jnp.transpose 2D,
(d) lane-axis flip via [:, ::-1],
(e) (8,128) -> (1,1024)-style sublane->lane flatten.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def probe(name, kernel, out_shape, *args):
    try:
        f = pl.pallas_call(kernel, out_shape=out_shape)
        r = jax.jit(f)(*args)
        r.block_until_ready()
        print(f"{name:44s} OK")
        return np.asarray(r)
    except Exception as e:
        msg = str(e).split("\n")[0][:110]
        print(f"{name:44s} FAIL: {msg}")
        return None


x = jnp.arange(64 * 4, dtype=jnp.float32).reshape(64, 4)
y = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
z = jnp.arange(256 * 128, dtype=jnp.float32).reshape(256, 128)


def k_reshape(x_ref, o_ref):
    o_ref[...] = x_ref[...].reshape(1, 256)

r = probe("reshape (64,4)->(1,256)", k_reshape, jax.ShapeDtypeStruct((1, 256), jnp.float32), x)
if r is not None:
    print("   correct:", bool(np.array_equal(r[0], np.arange(256))))


def k_reshape2(y_ref, o_ref):
    o_ref[...] = y_ref[...].reshape(1, 1024)

r = probe("reshape (8,128)->(1,1024)", k_reshape2, jax.ShapeDtypeStruct((1, 1024), jnp.float32), y)
if r is not None:
    print("   correct:", bool(np.array_equal(r[0], np.arange(1024))))


def k_unflatten(y_ref, o_ref):
    o_ref[...] = y_ref[...].reshape(64, 16)

r = probe("reshape (8,128)->(64,16)", k_unflatten, jax.ShapeDtypeStruct((64, 16), jnp.float32), y)
if r is not None:
    print("   correct:", bool(np.array_equal(r, np.arange(1024).reshape(64, 16))))


def k_dgt(z_ref, o_ref):
    ident = jax.lax.broadcasted_iota(jnp.int32, (256, 256), 0) == jax.lax.broadcasted_iota(
        jnp.int32, (256, 256), 1
    )
    o_ref[...] = jax.lax.dot_general(
        z_ref[...], ident.astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

r = probe("dot_general row-contract transpose", k_dgt, jax.ShapeDtypeStruct((128, 256), jnp.float32), z)
if r is not None:
    print("   correct:", bool(np.array_equal(r, np.asarray(z).T)))


def k_tr(z_ref, o_ref):
    o_ref[...] = z_ref[...].T

r = probe("jnp .T transpose (256,128)", k_tr, jax.ShapeDtypeStruct((128, 256), jnp.float32), z)
if r is not None:
    print("   correct:", bool(np.array_equal(r, np.asarray(z).T)))


def k_flip(y_ref, o_ref):
    o_ref[...] = y_ref[...][:, ::-1]

r = probe("lane flip [:, ::-1] (8,128)", k_flip, jax.ShapeDtypeStruct((8, 128), jnp.float32), y)
if r is not None:
    print("   correct:", bool(np.array_equal(r, np.asarray(y)[:, ::-1])))


def k_strided(z_ref, o_ref):
    o_ref[...] = z_ref[...][::8]

r = probe("strided row slice [::8] (256,128)", k_strided, jax.ShapeDtypeStruct((32, 128), jnp.float32), z)
if r is not None:
    print("   correct:", bool(np.array_equal(r, np.asarray(z)[::8])))
