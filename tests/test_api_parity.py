"""Mechanical API-parity gate against the reference package.

A user of cirKITers/qml-essentials should find every public symbol they
import at the same module path in this build (top-level shims
``qml_essentials_tpu.model``, ``.drawing``, … re-export the real
subpackages).  These tests parse the reference sources *statically* (no
reference import — its dependency set, e.g. PennyLane, is absent here) and
assert each public name resolves on our side:

* every top-level public class / function / UPPERCASE constant per module
  (ref qml_essentials/*.py);
* every public method of every reference class against the same-named
  class here;
* the reference ``Model``'s public attribute surface against a live
  instance (some reference properties are plain instance attributes in
  this build — behavioural parity, checked on an instance).

Skipped when the reference checkout is not present.
"""

import ast
import importlib
import os

import pytest

REF = "/root/reference/qml_essentials"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)

# Data files / non-module artifacts in the reference package dir.
_REF_MODULES = [
    fn[:-3]
    for fn in (sorted(os.listdir(REF)) if os.path.isdir(REF) else [])
    if fn.endswith(".py") and fn != "__init__.py"
]


def _ref_tree(mod: str) -> ast.Module:
    with open(os.path.join(REF, f"{mod}.py")) as f:
        return ast.parse(f.read())


def _public_toplevel(tree: ast.Module):
    """Top-level public classes, functions and CamelCase/UPPER assigns."""
    names = []
    for node in tree.body:
        if isinstance(node, (ast.ClassDef, ast.FunctionDef, ast.AsyncFunctionDef)):
            if not node.name.startswith("_"):
                names.append(node.name)
        elif isinstance(node, ast.Assign):
            for t in node.targets:
                if (
                    isinstance(t, ast.Name)
                    and not t.id.startswith("_")
                    and t.id[0].isupper()
                ):
                    names.append(t.id)
    return names


@pytest.mark.unittest
@pytest.mark.parametrize("mod", _REF_MODULES)
def test_module_public_symbols_present(mod):
    ours = importlib.import_module(f"qml_essentials_tpu.{mod}")
    missing = [n for n in _public_toplevel(_ref_tree(mod)) if not hasattr(ours, n)]
    assert not missing, f"qml_essentials_tpu.{mod} lacks reference symbols {missing}"


@pytest.mark.unittest
@pytest.mark.parametrize("mod", _REF_MODULES)
def test_class_public_methods_present(mod):
    ours = importlib.import_module(f"qml_essentials_tpu.{mod}")
    gaps = {}
    for node in _ref_tree(mod).body:
        if not isinstance(node, ast.ClassDef) or node.name.startswith("_"):
            continue
        ocls = getattr(ours, node.name, None)
        if ocls is None:
            continue  # absence is test_module_public_symbols_present's job
        meths = {
            m.name
            for m in node.body
            if isinstance(m, ast.FunctionDef) and not m.name.startswith("_")
        }
        # Reference Model exposes some state as @property; here they are
        # instance attributes (checked on a live instance below).
        if (mod, node.name) == ("model", "Model"):
            continue
        missing = sorted(m for m in meths if not hasattr(ocls, m))
        if missing:
            gaps[node.name] = missing
    assert not gaps, f"method-surface gaps in qml_essentials_tpu.{mod}: {gaps}"


def _ref_param_names(fnode: ast.FunctionDef):
    a = fnode.args
    names = [x.arg for x in a.posonlyargs + a.args + a.kwonlyargs]
    return [n for n in names if n not in ("self", "cls")]


def _accepts(obj, params):
    """Reference parameter names our callable does not accept by keyword."""
    import inspect

    try:
        sig = inspect.signature(obj)
    except (ValueError, TypeError):
        return []
    if any(p.kind == p.VAR_KEYWORD for p in sig.parameters.values()):
        return []
    return [p for p in params if p not in sig.parameters]


@pytest.mark.unittest
@pytest.mark.parametrize("mod", _REF_MODULES)
def test_public_callable_kwargs_accepted(mod):
    """Every keyword a reference user passes must be accepted here too
    (call sites written against the reference use keyword arguments)."""
    ours = importlib.import_module(f"qml_essentials_tpu.{mod}")
    gaps = {}
    for node in _ref_tree(mod).body:
        if isinstance(node, ast.FunctionDef) and not node.name.startswith("_"):
            obj = getattr(ours, node.name, None)
            if obj is not None:
                missing = _accepts(obj, _ref_param_names(node))
                if missing:
                    gaps[node.name] = missing
        elif isinstance(node, ast.ClassDef) and not node.name.startswith("_"):
            ocls = getattr(ours, node.name, None)
            if ocls is None:
                continue
            for m in node.body:
                if not isinstance(m, ast.FunctionDef):
                    continue
                if m.name != "__init__" and m.name.startswith("_"):
                    continue
                obj = ocls if m.name == "__init__" else getattr(ocls, m.name, None)
                if obj is None:
                    continue
                missing = _accepts(obj, _ref_param_names(m))
                if missing:
                    gaps[f"{node.name}.{m.name}"] = missing
    assert not gaps, f"kwarg gaps in qml_essentials_tpu.{mod}: {gaps}"


def _ref_literal_defaults(fnode: ast.FunctionDef):
    """{param: default} for reference defaults that are simple literals."""
    a = fnode.args
    out = {}
    pos = a.posonlyargs + a.args
    for p, d in zip(pos[len(pos) - len(a.defaults):], a.defaults):
        try:
            out[p.arg] = ast.literal_eval(d)
        except (ValueError, SyntaxError):
            pass
    for p, d in zip(a.kwonlyargs, a.kw_defaults):
        if d is None:
            continue
        try:
            out[p.arg] = ast.literal_eval(d)
        except (ValueError, SyntaxError):
            pass
    return out


@pytest.mark.unittest
@pytest.mark.parametrize("mod", _REF_MODULES)
def test_public_callable_defaults_match(mod):
    """Omitting a keyword must mean the same thing as in the reference
    (compared for literal defaults on comparable builtin types only)."""
    import inspect

    ours = importlib.import_module(f"qml_essentials_tpu.{mod}")

    def gaps_for(fnode, obj):
        try:
            sig = inspect.signature(obj)
        except (ValueError, TypeError):
            return {}
        g = {}
        for p, rd in _ref_literal_defaults(fnode).items():
            if p not in sig.parameters:
                continue  # kwarg-presence test's job
            od = sig.parameters[p].default
            if od is inspect.Parameter.empty or not isinstance(
                od, (bool, int, float, str, tuple, type(None))
            ):
                continue
            if od != rd:
                g[p] = (rd, od)
        return g

    gaps = {}
    for node in _ref_tree(mod).body:
        if isinstance(node, ast.FunctionDef) and not node.name.startswith("_"):
            obj = getattr(ours, node.name, None)
            if obj is not None:
                g = gaps_for(node, obj)
                if g:
                    gaps[node.name] = g
        elif isinstance(node, ast.ClassDef) and not node.name.startswith("_"):
            ocls = getattr(ours, node.name, None)
            if ocls is None:
                continue
            for m in node.body:
                if not isinstance(m, ast.FunctionDef):
                    continue
                if m.name != "__init__" and m.name.startswith("_"):
                    continue
                obj = ocls if m.name == "__init__" else getattr(ocls, m.name, None)
                if obj is None:
                    continue
                g = gaps_for(m, obj)
                if g:
                    gaps[f"{node.name}.{m.name}"] = g
    assert not gaps, (
        f"default-value gaps in qml_essentials_tpu.{mod} (ref, ours): {gaps}"
    )


@pytest.mark.unittest
def test_model_public_surface_on_instance():
    from qml_essentials_tpu.model import Model

    tree = _ref_tree("model")
    cls = next(
        n for n in tree.body if isinstance(n, ast.ClassDef) and n.name == "Model"
    )
    names = {
        m.name
        for m in cls.body
        if isinstance(m, ast.FunctionDef) and not m.name.startswith("_")
    }
    m = Model(n_qubits=2, n_layers=1, circuit_type="Circuit_1")
    missing = sorted(n for n in names if not hasattr(m, n))
    assert not missing, f"Model instance lacks reference attributes {missing}"
