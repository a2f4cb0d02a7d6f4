"""CPU-child environment scrubbing (utils/childenv.py)."""

import os

from deeppointmap_tpu.utils.childenv import (PLUGIN_SITE_DIRS_VAR,
                                             cpu_child_env)


def test_drops_sitecustomize_dirs_only(tmp_path):
    plugin = tmp_path / "plugin_site"
    plugin.mkdir()
    (plugin / "sitecustomize.py").write_text("pass\n")
    benign = tmp_path / "mylib"
    benign.mkdir()

    base = {"PYTHONPATH": os.pathsep.join([str(plugin), str(benign)])}
    env = cpu_child_env(base, platform="cpu")
    assert env["PYTHONPATH"] == str(benign)
    assert env["JAX_PLATFORMS"] == "cpu"


def test_explicit_override_wins(tmp_path):
    plugin = tmp_path / "plugin_site"
    plugin.mkdir()
    (plugin / "sitecustomize.py").write_text("pass\n")
    keep_anyway = tmp_path / "hooked_but_mine"
    keep_anyway.mkdir()
    (keep_anyway / "sitecustomize.py").write_text("pass\n")

    base = {
        "PYTHONPATH": os.pathsep.join([str(plugin), str(keep_anyway)]),
        PLUGIN_SITE_DIRS_VAR: str(plugin),
    }
    env = cpu_child_env(base)
    assert env["PYTHONPATH"] == str(keep_anyway)


def test_no_pythonpath_is_fine():
    env = cpu_child_env({}, platform="cpu")
    assert env["PYTHONPATH"] == ""


def test_real_environ_strips_relay_site():
    # On this machine the relay site dir is on PYTHONPATH; a CPU child
    # env must not carry any interpreter-start hook dirs.
    env = cpu_child_env()
    for p in env["PYTHONPATH"].split(os.pathsep):
        if not p:
            continue
        assert not os.path.isfile(os.path.join(p, "sitecustomize.py")), p
