"""Packaging surface: the reference ships a `kISS` binary (reference:
CMakeLists.txt:1-40); we ship the same command name as a console script.
These tests pin the pyproject metadata to the package without running
pip (the rig is offline)."""

import importlib
import os
import tomllib

import kiss_tpu

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_pyproject():
    with open(os.path.join(ROOT, "pyproject.toml"), "rb") as f:
        return tomllib.load(f)


def test_version_matches_package():
    assert _load_pyproject()["project"]["version"] == kiss_tpu.VERSION


def test_console_scripts_resolve():
    scripts = _load_pyproject()["project"]["scripts"]
    # the reference binary name must be the primary entry point
    assert "kISS" in scripts
    for target in scripts.values():
        mod, _, attr = target.partition(":")
        fn = getattr(importlib.import_module(mod), attr)
        assert callable(fn)


def test_module_entry_matches_script_entry():
    # `python -m kiss_tpu` and the console script must be the same main
    scripts = _load_pyproject()["project"]["scripts"]
    mod, _, attr = scripts["kISS"].partition(":")
    from kiss_tpu.cli import main

    assert getattr(importlib.import_module(mod), attr) is main
