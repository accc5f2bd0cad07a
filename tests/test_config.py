"""Config system parity (reference lib/config/config.py + vendored yacs):
parent_cfg inheritance, dotted CLI overrides with yacs value coercion,
exp_name placeholder expansion, derived dirs, reference module-path
mapping, sampler_meta aliasing."""

import glob
import os

import pytest

from enerf_tpu.config import Config, make_cfg

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_all_shipped_yamls_load():
    paths = glob.glob(os.path.join(REPO, "configs", "**", "*.yaml"),
                      recursive=True)
    assert paths
    for p in paths:
        cfg = make_cfg(p)
        assert isinstance(cfg, Config)
        assert cfg.enerf.cas_config.num == len(
            cfg.enerf.cas_config.volume_planes)


def test_parent_cfg_inheritance_and_override():
    child = os.path.join(REPO, "configs/enerf/dtu/scan114.yaml")
    parent = make_cfg(os.path.join(REPO, "configs/enerf/dtu_pretrain.yaml"))
    cfg = make_cfg(child)
    # the child inherits the cascade block from dtu_pretrain
    assert cfg.enerf.cas_config.num == parent.enerf.cas_config.num
    assert cfg.exp_name != parent.exp_name  # but overrides identity keys


def test_cli_override_grammar():
    """The README eval command grammar (reference README.md:113):
    tuple-valued dotted overrides via yacs literal coercion."""
    cfg = make_cfg(
        os.path.join(REPO, "configs/enerf/dtu_pretrain.yaml"),
        ["enerf.cas_config.render_if", "False,True",
         "enerf.cas_config.volume_planes", "48,8",
         "enerf.eval_depth", "True",
         "save_result", "False",
         "other_opts", "ignored", "tail"])
    assert cfg.enerf.cas_config.render_if == (False, True)
    assert cfg.enerf.cas_config.volume_planes == (48, 8)
    assert cfg.enerf.eval_depth is True
    assert cfg.save_result is False


def test_exp_name_tag_and_placeholders():
    cfg = make_cfg(None, ["exp_name", "gitcommit_x", "exp_name_tag", "t1"])
    assert cfg.exp_name.endswith("_x_t1")
    assert "gitcommit" not in cfg.exp_name  # expanded to a real sha
    # result_dir layout: workspace/result/task/exp_name/save_tag
    # (reference config.py:164)
    parts = cfg.result_dir.split(os.sep)
    assert parts[-3:] == ["enerf", cfg.exp_name, "default"]


def test_reference_module_paths_map():
    cfg = make_cfg(None, ["network_module", "lib.networks.enerf.network_human",
                          "test_dataset_module", "lib.datasets.zjumocap.enerf"])
    assert cfg.network_module == "enerf_tpu.models.enerf_human"
    assert cfg.test_dataset_module == "enerf_tpu.datasets.zjumocap"


def test_sampler_meta_alias():
    cfg = make_cfg(None, ["train.sampler_meta",
                          "{'input_views_num': [2, 3], "
                          "'input_views_prob': [0.25, 0.75]}"])
    assert cfg.train.input_views_num == (2, 3)
    assert cfg.train.input_views_prob == (0.25, 0.75)


def test_workspace_resolution(monkeypatch, tmp_path):
    monkeypatch.setenv("workspace", str(tmp_path))
    cfg = make_cfg(None, [])
    assert cfg.workspace == str(tmp_path)
    assert cfg.trained_model_dir.startswith(str(tmp_path))
    cfg2 = make_cfg(None, [], workspace="/elsewhere")
    assert cfg2.workspace == "/elsewhere"


def test_scientific_notation_lr():
    """pyyaml parses 5e-4 as a string; the loader must coerce
    (CLAUDE.md gotcha; reference relies on yacs type coercion)."""
    cfg = make_cfg(os.path.join(REPO, "configs/enerf/dtu_pretrain.yaml"))
    assert isinstance(cfg.train.lr, float) and 0 < cfg.train.lr < 1


def test_config_is_hashable_and_frozen():
    cfg = make_cfg(None, [])
    hash(cfg)  # jit-static usable
    with pytest.raises(Exception):
        cfg.task = "other"
