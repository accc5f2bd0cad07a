"""Component factories: config-named module → class, via importlib.

Replaces the reference's ``imp.load_source`` plugin mechanism
(lib/networks/make_network.py:5-9, lib/evaluators/make_evaluator.py,
lib/visualizers/make_visualizer.py) with a plain import of the module
named by the config registry key. Each network module exposes ``Network``
(a flax module class taking cfg/train_mode/axis_name/dtype); evaluator and
visualizer modules expose ``Evaluator`` / ``Visualizer``.
"""

from __future__ import annotations

import importlib

from enerf_tpu.config import Config


def make_network(cfg: Config, train_mode: bool = True, axis_name=None,
                 dtype=None):
    import jax.numpy as jnp

    module = importlib.import_module(cfg.network_module)
    return module.Network(
        cfg=cfg.enerf, train_mode=train_mode, axis_name=axis_name,
        dtype=dtype if dtype is not None else jnp.dtype(cfg.compute_dtype))


def network_class(cfg: Config):
    return importlib.import_module(cfg.network_module).Network


def make_evaluator(cfg: Config):
    return importlib.import_module(cfg.evaluator_module).Evaluator(cfg)


def make_visualizer(cfg: Config):
    return importlib.import_module(cfg.visualizer_module).Visualizer(cfg)
