"""Plugin registry tests (counterpart of reference tests/plugins/test_registry.py)."""

import sys
import types

from neurad_tpu.plugins.registry import METHOD_ENV_VAR, discover_methods


def test_env_var_discovery(monkeypatch):
    mod = types.ModuleType("fake_plugin_mod")
    mod.make_config = lambda: "fake-method-config"
    sys.modules["fake_plugin_mod"] = mod
    monkeypatch.setenv(METHOD_ENV_VAR, "my-method=fake_plugin_mod:make_config")
    methods = discover_methods()
    assert "my-method" in methods
    assert methods["my-method"]() == "fake-method-config"
    del sys.modules["fake_plugin_mod"]


def test_bad_env_spec_does_not_crash(monkeypatch):
    monkeypatch.setenv(METHOD_ENV_VAR, "broken=not_a_module:nope")
    methods = discover_methods()
    assert "broken" not in methods


def test_register_into_main_registry(monkeypatch):
    mod = types.ModuleType("fake_plugin_mod2")

    def factory():
        from neurad_tpu.configs.method_configs import get_method_config

        return get_method_config("neurad-tiny")

    mod.factory = factory
    sys.modules["fake_plugin_mod2"] = mod
    monkeypatch.setenv(METHOD_ENV_VAR, "plugin-method=fake_plugin_mod2:factory")
    from neurad_tpu.plugins.registry import register_discovered_methods

    register_discovered_methods()
    from neurad_tpu.configs.method_configs import get_method_config

    cfg = get_method_config("plugin-method")
    assert cfg.method_name == "neurad-tiny"
    del sys.modules["fake_plugin_mod2"]
