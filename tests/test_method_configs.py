"""Every registered method preset must build (counterpart of the reference's
tyro-instantiation coverage of `configs/method_configs.py:49`)."""

import pytest

from neurad_tpu.configs.method_configs import _REGISTRY, get_method_config


@pytest.mark.parametrize("name", sorted(_REGISTRY))
def test_preset_builds(name):
    cfg = get_method_config(name)
    assert cfg.method_name == name
    assert cfg.trainer.max_num_iterations > 0
    assert cfg.pipeline is not None
    assert cfg.pipeline_type in ("ad", "splatad", "splatfacto")


def test_parity_preset_is_reference_faithful():
    cfg = get_method_config("neurad-parity")
    mo = cfg.pipeline.model_overrides
    assert mo["proposal_mode"] == "hashgrid"
    assert mo["compute_fp32"] is True
    assert mo["field_static"].parity and not mo["field_static"].cell_packed
    assert all(s.parity for s in mo["proposal_static"])
