"""Generic fit checkpointing: save/load ANY registered fit pytree
(PLSFit, OPLSFit, KPLSFit, Residual, …) to .npz.

The reference has no persistence at all (SURVEY.md §5 — fits are
seconds-scale); PLSModel.save/load covers the reference-shaped model
object (model.py), and this module generalizes checkpointing to every fit
family: array leaves become npz entries keyed by their pytree attribute
path, static aux fields (method enums, kernel hyper-parameters, labels)
ride in a JSON `meta` entry together with the pytree type name, so
`load_fit` reconstructs the exact object — no pickle anywhere
(allow_pickle=False throughout).
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

from pls_tpu.types import METHOD, PLSFit, Residual

# registry of persistable pytree dataclasses (name -> class)
_TYPES: dict[str, type] = {}


def register_checkpointable(cls: type) -> type:
    """Register a @jax.tree_util.register_dataclass type for save_fit/
    load_fit (usable as a decorator on user-defined fit pytrees)."""
    _TYPES[cls.__name__] = cls
    return cls


register_checkpointable(PLSFit)
register_checkpointable(Residual)


def _ensure_ext_types():
    # lazy: avoids import cycles at module-load time
    from pls_tpu.models.kpls import KPLSFit
    from pls_tpu.models.opls import OPLSFit

    register_checkpointable(KPLSFit)
    register_checkpointable(OPLSFit)


def _path_str(keypath) -> str:
    return "/".join(
        getattr(k, "name", None) or str(getattr(k, "key", k)) for k in keypath
    )


def _encode_aux(v):
    return {"__enum__": v.value} if isinstance(v, METHOD) else v


def _decode_aux(v):
    if isinstance(v, dict) and "__enum__" in v:
        return METHOD(v["__enum__"])
    return v


def _collect_aux(obj) -> dict:
    """Static (non-leaf) dataclass fields, recursing into nested pytree
    dataclasses (keyed '/name') so e.g. OPLSFit.pls.method survives."""
    leaves = jax.tree_util.tree_flatten_with_path(obj)[0]
    leaf_tops = {_path_str(kp).split("/")[0] for kp, _ in leaves}
    aux = {}
    for fname in type(obj).__dataclass_fields__:
        v = getattr(obj, fname)
        if fname in leaf_tops:
            if hasattr(type(v), "__dataclass_fields__"):
                sub = _collect_aux(v)
                if sub:
                    aux["/" + fname] = sub
            continue
        aux[fname] = _encode_aux(v)
    return aux


def save_fit(fit, path: str) -> None:
    """Serialize a registered fit pytree to `path` (.npz, no pickle)."""
    _ensure_ext_types()
    name = type(fit).__name__
    if name not in _TYPES:
        raise TypeError(
            f"{name} is not checkpointable; register_checkpointable() it"
        )
    leaves = jax.tree_util.tree_flatten_with_path(fit)[0]
    arrays = {f"leaf:{_path_str(kp)}": np.asarray(v) for kp, v in leaves}
    aux = _collect_aux(fit)
    np.savez(path, **arrays, meta=json.dumps({"type": name, "aux": aux}))


def _rebuild(meta: dict, leaf_items: dict):
    """Reconstruct the fit object from {path: array} leaves + meta aux."""
    cls = _TYPES.get(meta["type"])
    if cls is None:
        raise TypeError(f"unknown checkpoint type {meta['type']!r}")
    kwargs: dict = {}
    for field_path, val in leaf_items.items():
        top, _, rest = field_path.partition("/")
        val = jnp.asarray(val)
        if rest:
            kwargs.setdefault(top, {})[rest] = val
        else:
            kwargs[top] = val
    aux = dict(meta["aux"])
    for k, v in list(kwargs.items()):
        if isinstance(v, dict):
            # one nesting level is sufficient for all shipped fit types
            # (OPLSFit.pls is a PLSFit)
            sub_aux = {
                sk: _decode_aux(sv) for sk, sv in aux.pop("/" + k, {}).items()
            }
            kwargs[k] = PLSFit(**v, **sub_aux)
    for k, v in aux.items():
        if k.startswith("/"):
            continue  # nested aux for an absent field — ignore
        kwargs[k] = _decode_aux(v)
    return cls(**kwargs)


def load_fit(path: str):
    """Reconstruct a fit pytree saved by `save_fit`."""
    _ensure_ext_types()
    z = np.load(path, allow_pickle=False)
    meta = json.loads(str(z["meta"]))
    leaves = {
        k[len("leaf:"):]: z[k] for k in z.files if k.startswith("leaf:")
    }
    return _rebuild(meta, leaves)


def save_fit_orbax(fit, path: str) -> None:
    """Serialize a registered fit pytree with orbax (directory format).

    Unlike the .npz path this preserves jax.Array shardings and writes
    each host's shards in parallel — the right backend for multi-host
    meshes and for fits too large for one host's memory.  `path` is a
    directory; an existing checkpoint there is overwritten (same
    semantics as save_fit's np.savez).  Metadata (pytree type + static
    aux fields) lands in `meta.json` beside orbax's array store."""
    _ensure_ext_types()
    import os

    import orbax.checkpoint as ocp

    name = type(fit).__name__
    if name not in _TYPES:
        raise TypeError(
            f"{name} is not checkpointable; register_checkpointable() it"
        )
    path = os.path.abspath(path)
    leaves = jax.tree_util.tree_flatten_with_path(fit)[0]
    # keep the jax.Arrays themselves: orbax records their shardings.
    # orbax refuses zero-size arrays (e.g. the empty T of a type-2 fit),
    # so those ride in meta.json as shape+dtype stubs instead.
    arrays, empties = {}, {}
    for kp, v in leaves:
        key = _path_str(kp).replace("/", ".")
        if v.size == 0:
            empties[key] = {"shape": list(v.shape), "dtype": str(v.dtype)}
        else:
            arrays[key] = v
    os.makedirs(path, exist_ok=True)
    # force=True: overwrite an existing checkpoint (np.savez semantics)
    ocp.PyTreeCheckpointer().save(
        os.path.join(path, "arrays"), arrays, force=True
    )
    with open(os.path.join(path, "meta.json"), "w") as fh:
        json.dump(
            {"type": name, "aux": _collect_aux(fit), "empties": empties}, fh
        )


def load_fit_orbax(path: str):
    """Reconstruct a fit pytree saved by `save_fit_orbax`."""
    _ensure_ext_types()
    import os

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with open(os.path.join(path, "meta.json")) as fh:
        meta = json.load(fh)
    arrays = ocp.PyTreeCheckpointer().restore(os.path.join(path, "arrays"))
    leaves = {k.replace(".", "/"): v for k, v in arrays.items()}
    for key, spec in meta.get("empties", {}).items():
        leaves[key.replace(".", "/")] = jnp.zeros(
            tuple(spec["shape"]), spec["dtype"]
        )
    return _rebuild(meta, leaves)
