"""Environment scrubbing for CPU-only child processes.

Some machines inject a device-plugin loader via a ``sitecustomize.py`` on
``PYTHONPATH`` (e.g. a remote-TPU relay client) that dials the device link
at *interpreter start* — before ``JAX_PLATFORMS`` is even consulted. A
CPU-forced child (multi-agent worker, multi-host trainer, subprocess test)
must therefore drop those import-path entries or it hangs whenever the
link is down.

The set of dirs to drop is explicit, not a substring guess:

* ``DPM_PLUGIN_SITE_DIRS`` (``os.pathsep``-separated exact paths) names
  the plugin site dirs when set — the override for unusual setups.
* Otherwise any ``PYTHONPATH`` entry that contains a ``sitecustomize.py``
  is dropped: an interpreter-start hook is exactly the mechanism being
  shielded against, and normal library path entries don't carry one.
"""

from __future__ import annotations

import os

PLUGIN_SITE_DIRS_VAR = "DPM_PLUGIN_SITE_DIRS"


def _plugin_site_dirs(env: dict) -> set:
    override = env.get(PLUGIN_SITE_DIRS_VAR)
    if override is not None:
        return {os.path.normpath(p)
                for p in override.split(os.pathsep) if p}
    return {os.path.normpath(p)
            for p in env.get("PYTHONPATH", "").split(os.pathsep)
            if p and os.path.isfile(os.path.join(p, "sitecustomize.py"))}


def cpu_child_env(base: dict | None = None, *,
                  platform: str | None = None) -> dict:
    """A copy of ``base`` (default ``os.environ``) safe for a CPU-only
    child: device-plugin site dirs are removed from ``PYTHONPATH`` and,
    if ``platform`` is given, ``JAX_PLATFORMS`` is pinned to it."""
    env = dict(os.environ if base is None else base)
    drop = _plugin_site_dirs(env)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and os.path.normpath(p) not in drop)
    if platform is not None:
        env["JAX_PLATFORMS"] = platform
    return env
