"""Checkpoint / resume: snapshot the full SLAM state to a single .npz.

The reference has no save/load at all (SURVEY.md §5 — "no map save/load,
no trajectory export"); this adds it: the window pytree, calibration,
candidate (immature) state, tracker reference, and host-side shell history
round-trip through one compressed archive.
"""
from __future__ import annotations

import json
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _flatten_named(tree, prefix):
    leaves = {}
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    for path, leaf in flat:
        key = prefix + "/" + "/".join(str(p) for p in path)
        leaves[key] = np.asarray(leaf)
    return leaves, treedef


def save_state(path: str, system) -> None:
    """Snapshot a models.system.SLAMSystem."""
    arrays: dict = {}
    wnd_leaves, _ = _flatten_named(system.window, "window")
    arrays.update(wnd_leaves)
    arrays["calib/value"] = np.asarray(system.calib.value)
    arrays["calib/value_zero"] = np.asarray(system.calib.value_zero)

    imm_leaves, _ = _flatten_named(system.imm, "immt")
    arrays.update(imm_leaves)
    ft_leaves, _ = _flatten_named(system.feats, "feats")
    arrays.update(ft_leaves)
    # host policy mirrors (refreshed from each keyframe's bundle)
    for name in ("_m_valid", "_m_kfid", "_m_t", "_m_aff", "_m_exp",
                 "_m_nact_host", "_m_nimm_host"):
        arrays["mirror/" + name] = np.asarray(getattr(system, name))

    if system.template is not None:
        tm_leaves, _ = _flatten_named(system.template, "template")
        arrays.update(tm_leaves)

    shells = [
        dict(id=s.id, timestamp=s.timestamp, exposure=s.exposure,
             cam_to_world=s.cam_to_world.tolist(),
             tracking_ref=s.tracking_ref,
             cam_to_ref=s.cam_to_ref.tolist(), aff=s.aff.tolist(),
             is_kf=s.is_kf, kf_id=s.kf_id, pose_valid=s.pose_valid)
        for s in system.shells
    ]
    meta = dict(
        shells=shells,
        slot_shell=system.slot_shell,
        initialized=system.initialized,
        frame_count=system.frame_count,
        next_kf_id=system.next_kf_id,
        kf_shell_ids=system.kf_shell_ids,
        current_min_act_dist=system.current_min_act_dist,
        last_coarse_rmse=system.last_coarse_rmse.tolist(),
        first_coarse_rmse=system.first_coarse_rmse,
        ref_slot=system.ref_slot,
        ref_shell_id=system.ref_shell_id,
        ref_aff=np.asarray(system.ref_aff).tolist(),
        ref_exposure=system.ref_exposure,
        calib_size=[system.width, system.height],
        marg_counts={str(k): v for k, v in system._marg_counts.items()},
    )
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8
    )
    np.savez_compressed(path, **arrays)


def load_state(path: str, system) -> None:
    """Restore into an already-constructed SLAMSystem (same Config and
    image size)."""
    from ..models.system import Shell

    data = np.load(path, allow_pickle=False)
    meta = json.loads(bytes(data["__meta__"].tobytes()).decode())

    def unflatten(prefix, template_tree):
        flat, treedef = jax.tree_util.tree_flatten_with_path(template_tree)
        leaves = []
        for pathspec, leaf in flat:
            key = prefix + "/" + "/".join(str(p) for p in pathspec)
            leaves.append(jnp.asarray(data[key]))
        return jax.tree_util.tree_unflatten(treedef, leaves)

    system.window = unflatten("window", system.window)
    system.calib = system.calib._replace(
        value=jnp.asarray(data["calib/value"]),
        value_zero=jnp.asarray(data["calib/value_zero"]),
    )
    system._K_pyr_cache = system._k_pyr(system.calib.value)
    system.imm = unflatten("immt", system.imm)
    if any(k.startswith("feats/") for k in data):
        system.feats = unflatten("feats", system.feats)
    for name in ("_m_valid", "_m_kfid", "_m_t", "_m_aff", "_m_exp",
                 "_m_nact_host", "_m_nimm_host"):
        if "mirror/" + name in data:
            setattr(system, name, np.asarray(data["mirror/" + name]))
    system._m_n_active = int(system._m_nact_host.sum())

    if "template/0/[0]" in data or any(k.startswith("template/") for k in data):
        # rebuild the template pytree if present
        if system.template is None:
            from ..ops import tracker as trk
            n_lvl = system.cfg.pyr_levels
            dummy = trk.Template(
                u=[jnp.zeros(1)] * n_lvl, v=[jnp.zeros(1)] * n_lvl,
                idepth=[jnp.zeros(1)] * n_lvl, color=[jnp.zeros(1)] * n_lvl,
                valid=[jnp.zeros(1, bool)] * n_lvl,
            )
            # leaf shapes come from the file; reconstruct by key order
            flat, treedef = jax.tree_util.tree_flatten_with_path(dummy)
            leaves = []
            for pathspec, _ in flat:
                key = "template/" + "/".join(str(p) for p in pathspec)
                leaves.append(jnp.asarray(data[key]))
            system.template = jax.tree_util.tree_unflatten(treedef, leaves)

    system.shells = [
        Shell(id=s["id"], timestamp=s["timestamp"], exposure=s["exposure"],
              cam_to_world=np.array(s["cam_to_world"]),
              tracking_ref=s["tracking_ref"],
              cam_to_ref=np.array(s["cam_to_ref"]),
              aff=np.array(s["aff"]), is_kf=s["is_kf"], kf_id=s["kf_id"],
              pose_valid=s["pose_valid"])
        for s in meta["shells"]
    ]
    system.slot_shell = meta["slot_shell"]
    system.initialized = meta["initialized"]
    system.frame_count = meta["frame_count"]
    system.next_kf_id = meta["next_kf_id"]
    system.kf_shell_ids = meta["kf_shell_ids"]
    system.current_min_act_dist = meta["current_min_act_dist"]
    system.last_coarse_rmse = np.array(meta["last_coarse_rmse"])
    system.first_coarse_rmse = meta["first_coarse_rmse"]
    system.ref_slot = meta["ref_slot"]
    system.ref_shell_id = meta["ref_shell_id"]
    system.ref_aff = np.array(meta["ref_aff"])
    system.ref_exposure = meta["ref_exposure"]
    system._marg_counts = {int(k): v for k, v in meta["marg_counts"].items()}
