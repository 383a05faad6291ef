"""Config subsystem tests: inherits_from DAG, merge priority, ParamDict
immutability, cmd-line entry (reference: icem/misc/helpers.py:116-272,
SURVEY.md §5.6)."""

import json
import os

import pytest

from icem_tpu.runtime.config import (ParamDict, apply_overrides,
                                     params_from_cmd_line, resolve_settings,
                                     update_recursive)


def _write(path, data):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(data, f)


@pytest.fixture()
def tree(tmp_path):
    """settings tree: exp/config.json inherits [defaults, ..shared.base]."""
    root = tmp_path / "settings"
    _write(str(root / "shared" / "base.json"),
           {"a": 1, "nested": {"x": 1, "y": 1}, "only_base": True})
    _write(str(root / "exp" / "defaults.json"),
           {"inherits_from": ["..shared.base"],
            "a": 2, "nested": {"x": 2}, "only_defaults": True})
    _write(str(root / "exp" / "config.json"),
           {"inherits_from": ["defaults"],
            "nested": {"y": 3}, "top": "cfg"})
    return str(root / "exp" / "config.json")


def test_inheritance_dag_and_merge_priority(tree):
    p = resolve_settings(tree)
    # declaring file wins over all parents
    assert p.nested.y == 3 and p.top == "cfg"
    # REFERENCE QUIRK (helpers.py:171-187): ancestors are merged in
    # discovery order with later-merged winning, so a grandparent's value
    # overrides its child's for keys both define — the declaring file alone
    # beats everything. We reproduce this exactly for settings parity.
    assert p.a == 1 and p.nested.x == 1
    # keys unique to each level all survive the deep merge
    assert p.only_base is True and p.only_defaults is True
    # the meta key is stripped
    assert "inherits_from" not in p


def test_paramdict_is_immutable_and_dot_accessible(tree):
    p = resolve_settings(tree)
    assert p["a"] == p.a == 1
    with pytest.raises(TypeError):
        p.a = 5
    with pytest.raises(TypeError):
        p["a"] = 5
    with pytest.raises(AttributeError):
        _ = p.does_not_exist
    # nested values are ParamDicts too
    assert isinstance(p.nested, ParamDict)


def test_cmd_line_entry_with_overrides(tree):
    p = params_from_cmd_line(["main.py", tree, "a=7", "nested.x=9",
                              "top=other"])
    assert p.a == 7 and p.nested.x == 9 and p.top == "other"
    # untouched values survive overrides
    assert p.nested.y == 3


def test_cmd_line_dict_literal_and_import_guard():
    p = params_from_cmd_line(["main.py", "{'a': 1, 'b': {'c': 2}}"])
    assert p.a == 1 and p.b.c == 2
    with pytest.raises(ImportError):
        params_from_cmd_line(["main.py", "{'x': '__import__(\"os\")'}"])


def test_update_recursive_deep_merge():
    d = {"a": {"b": 1, "c": 2}, "k": 0}
    update_recursive(d, {"a": {"b": 9}, "new": 1})
    assert d == {"a": {"b": 9, "c": 2}, "k": 0, "new": 1}
    with pytest.raises(KeyError):
        update_recursive({"a": 1}, {"zz": 2}, defensive=True)


def test_diamond_inheritance_resolves_once(tmp_path):
    """A DAG (not a tree): both parents inherit the same grandparent."""
    root = tmp_path / "s"
    _write(str(root / "g.json"), {"g": 1, "v": "g"})
    _write(str(root / "p1.json"), {"inherits_from": ["g"], "v": "p1"})
    _write(str(root / "p2.json"), {"inherits_from": ["g"], "v": "p2"})
    _write(str(root / "c.json"), {"inherits_from": ["p1", "p2"]})
    p = resolve_settings(str(root / "c.json"))
    assert p.g == 1
    # earlier inherits_from entries win over later ones (reference semantics)
    assert p.v == "p1"


def test_shipped_settings_resolve_expected_models():
    """Guard against the deeper-ancestor-wins quirk clobbering leaf configs
    in the shipped settings tree."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    s = lambda *p: os.path.join(repo, "settings", *p)
    assert resolve_settings(s("planet", "cartpole_swingup.json")).forward_model == "RSSM"
    assert resolve_settings(s("pendulum", "ensemble-icem.json")).forward_model == "EnsembleModel"
    p = resolve_settings(s("halfcheetah_running", "i-cem-blitz.json"))
    assert p.forward_model == "ParallelGroundTruthModel"
    assert p.controller == "mpc-icem"
    assert p.env == "HalfCheetah"
    hop = resolve_settings(s("hopper", "i-cem-blitz.json"))
    assert hop.controller_params.action_sampler_params.noise_beta == 2.5
