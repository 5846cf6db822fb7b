"""Activation functions (parity: pytorch/libs/nnet/activation.py).

All are stateless jnp functions; `get_activation` is the factory the model
zoo uses (reference Nonlinearity factory activation.py:58-94).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


def swish(x):
    return x * jax.nn.sigmoid(x)


def double_swish(x):
    """x * sigmoid(x - 1) (reference activation.py:29-55, k2/icefall variant)."""
    return x * jax.nn.sigmoid(x - 1.0)


_ACTIVATIONS = {
    "relu": jax.nn.relu,
    "relu6": jax.nn.relu6,
    "gelu": jax.nn.gelu,
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "selu": jax.nn.selu,
    "mish": mish,
    "swish": swish,
    "double_swish": double_swish,
    "elu": jax.nn.elu,
    "softplus": jax.nn.softplus,
    "": None,
    "none": None,
    None: None,
}


def get_activation(name):
    if callable(name):
        return name
    key = name.lower() if isinstance(name, str) else name
    if key not in _ACTIVATIONS:
        raise ValueError(f"Unknown activation {name!r}")
    return _ACTIVATIONS[key]
