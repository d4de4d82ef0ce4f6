"""Checkpointing: dual full/compact savers with retention, natural sort.

Mirrors the reference's checkpoint contract (SURVEY.md §5; train_fn.py:66-70,
130-132; infer.py:90-97; model_base.py:422-490):

  - ``model-<step>`` — full training state (params + optimizer + step),
    keep the 2 most recent;
  - ``model_compact-<step>`` — model params only, keep ``max_saves`` (12);
  - inference enumerates compact checkpoints in natural (numeric) order and
    evaluates the last 12 when more than 20 exist;
  - 3-way restore: full resume / model-only (minus excluded scopes) /
    CNN-only into the encoder subtree.

Serialization is flax msgpack (single file per checkpoint, atomic rename)
by default; an opt-in Orbax backend (``config.checkpoint_backend='orbax'``,
SURVEY.md §5 "TPU equivalent: Orbax with an explicit params/opt-state
split") writes ``model-<step>.orbax/`` tensorstore directories instead —
the layout that scales to multi-host sharded state. Both backends share
the naming/retention/natural-sort contract; the loaders dispatch on the
artifact found on disk, so runs can switch backends mid-experiment.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np
from flax import serialization

from ..utils.natural_sort import natural_key
from .optimizer import _normalize_scopes, path_string

Params = Dict[str, Any]

FULL_PREFIX = "model-"
COMPACT_PREFIX = "model_compact-"
_SUFFIX = ".msgpack"
_ORBAX_SUFFIX = ".orbax"
_TF_SUFFIX = ".index"  # TF V2-format checkpoints (reference model_compact-N)


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def _atomic_write(path: str, data: bytes) -> None:
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def _prune(directory: str, prefix: str, keep: int) -> None:
    import shutil

    # Only artifacts this framework wrote (msgpack/orbax) participate in
    # retention. Reference TF checkpoints sharing the dir are discoverable
    # but must neither be deleted nor consume keep slots — they natural-
    # sort above a fresh run's low step numbers and would otherwise evict
    # every newly saved checkpoint immediately.
    ckpts = [p for p in list_checkpoints(directory, prefix)
             if os.path.exists(os.path.join(directory, p + _SUFFIX))
             or os.path.exists(os.path.join(directory, p + _ORBAX_SUFFIX))]
    for p in ckpts[:-keep] if keep > 0 else []:
        for suffix in (_SUFFIX, _ORBAX_SUFFIX):
            path = os.path.join(directory, p + suffix)
            try:
                if os.path.isdir(path):
                    shutil.rmtree(path)
                elif os.path.exists(path):
                    os.remove(path)
            except OSError:
                pass


def list_checkpoints(directory: str, prefix: str = COMPACT_PREFIX
                     ) -> List[str]:
    """Checkpoint basenames (no suffix), natural-sorted ascending.
    Recognizes msgpack files, orbax directories, and reference TF
    checkpoints (`model_compact-N.index`, converted on load)."""
    if not os.path.isdir(directory):
        return []
    pat = re.compile(re.escape(prefix) + r"\d+"
                     + f"({re.escape(_SUFFIX)}|{re.escape(_ORBAX_SUFFIX)}"
                     + f"|{re.escape(_TF_SUFFIX)})$")
    names = {f[: f.rfind(".")] for f in os.listdir(directory)
             if pat.match(f)}
    return sorted(names, key=natural_key)


def checkpoint_step(name: str) -> int:
    m = re.search(r"(\d+)$", name)
    return int(m.group(1)) if m else -1


def select_eval_checkpoints(directory: str, cap: int = 12,
                            threshold: int = 20) -> List[str]:
    """Reference rule: evaluate all compact ckpts, but only the last `cap`
    when more than `threshold` exist (infer.py:90-97)."""
    names = list_checkpoints(directory, COMPACT_PREFIX)
    if len(names) > threshold:
        names = names[-cap:]
    return names


def save_checkpoint(directory: str, step: int, params: Params,
                    opt_state: Any = None, *, max_saves: int = 12) -> Tuple[str, str]:
    """Write both the full and compact checkpoints; returns their paths."""
    os.makedirs(directory, exist_ok=True)
    compact = os.path.join(directory, f"{COMPACT_PREFIX}{step}{_SUFFIX}")
    _atomic_write(compact, serialization.to_bytes(_to_numpy(params)))
    full = os.path.join(directory, f"{FULL_PREFIX}{step}{_SUFFIX}")
    state = {"params": _to_numpy(params), "step": np.int64(step)}
    if opt_state is not None:
        state["opt_state"] = _to_numpy(opt_state)
    _atomic_write(full, serialization.to_bytes(state))
    _prune(directory, COMPACT_PREFIX, max_saves)
    _prune(directory, FULL_PREFIX, 2)
    return full, compact


class AsyncCheckpointer:
    """Background checkpoint writer: serialization + file IO + retention
    pruning run on a worker thread so the training loop only pays for the
    device->host transfer.

    The transfer itself stays synchronous on purpose: the fused train step
    donates its state buffers, so an in-flight async d2h copy could race
    with the next step's buffer reuse (and this backend's stream semantics
    are unusual — see CLAUDE.md). msgpack encoding of the ~25 MB state and
    the disk write are the dominant host cost and overlap fully.

    Worker exceptions surface on the next save()/wait(). Use as a drop-in
    for save_checkpoint; call close() (or wait()) before reading the files.
    """

    def __init__(self):
        import queue
        import threading

        self._q: "queue.Queue" = queue.Queue(maxsize=2)
        self._err: Optional[BaseException] = None
        self._closed = False
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        while True:
            job = self._q.get()
            if job is None:
                self._q.task_done()  # keep join() after close() unblocked
                return
            try:
                save_checkpoint(**job)
            except BaseException as e:  # surfaced on next call
                self._err = e
            finally:
                self._q.task_done()

    def _raise_pending(self):
        if self._err is not None:
            err, self._err = self._err, None
            raise err

    def save(self, directory: str, step: int, params: Params,
             opt_state: Any = None, *, max_saves: int = 12) -> None:
        """Snapshot to host (synchronous) and enqueue the write."""
        if self._closed:
            # enqueueing to the dead worker would silently drop the save
            raise RuntimeError("AsyncCheckpointer.save() after close()")
        self._raise_pending()
        self._q.put(dict(directory=directory, step=int(step),
                         params=_to_numpy(params),
                         opt_state=(None if opt_state is None
                                    else _to_numpy(opt_state)),
                         max_saves=max_saves))

    def wait(self) -> None:
        self._q.join()
        self._raise_pending()

    def close(self) -> None:
        if self._closed:
            return  # idempotent
        self.wait()
        self._closed = True
        self._q.put(None)
        self._thread.join()


def _orbax_sanitize(tree):
    """Orbax restore templates reject numpy scalar leaves; use python ints
    (values restore to the saved ones regardless)."""
    return jax.tree_util.tree_map(
        lambda x: int(x) if isinstance(x, (int, np.integer)) else x, tree)


def _orbax_restore(path: str, template):
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer().restore(
        os.path.abspath(path), _orbax_sanitize(template))


class OrbaxCheckpointer:
    """Opt-in Orbax backend (``checkpoint_backend='orbax'``): writes the
    same dual full/compact artifacts as tensorstore directories
    (``model-<step>.orbax/``) via orbax's own async machinery. Use for
    multi-host / sharded state where a single msgpack file per host does
    not compose; msgpack stays the default (CLAUDE.md).

    Drop-in for AsyncCheckpointer: save()/wait()/close().
    """

    def __init__(self):
        import orbax.checkpoint as ocp

        self._full = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        self._compact = ocp.AsyncCheckpointer(
            ocp.StandardCheckpointHandler())

    def save(self, directory: str, step: int, params: Params,
             opt_state: Any = None, *, max_saves: int = 12) -> None:
        import orbax.checkpoint as ocp

        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        # wait for the previous pair before pruning/overwriting, then
        # prune reserving one slot for the checkpoint about to land
        self.wait()
        _prune(directory, COMPACT_PREFIX, max(max_saves - 1, 1))
        _prune(directory, FULL_PREFIX, 1)
        # Snapshot to host BEFORE handing off to orbax's async save: the
        # caller's next jitted step may donate these same device buffers,
        # and on the axon-tunneled backend orbax's pre-return d2h copy
        # guarantee cannot be assumed (block_until_ready does not actually
        # synchronize there — CLAUDE.md). Same policy as the msgpack
        # saver's _to_numpy snapshot.
        params = _to_numpy(params)
        if opt_state is not None:
            opt_state = _to_numpy(opt_state)
        compact = os.path.join(
            directory, f"{COMPACT_PREFIX}{int(step)}{_ORBAX_SUFFIX}")
        self._compact.save(compact, args=ocp.args.StandardSave(params),
                           force=True)
        state = {"params": params, "step": int(step)}
        if opt_state is not None:
            state["opt_state"] = opt_state
        full = os.path.join(
            directory, f"{FULL_PREFIX}{int(step)}{_ORBAX_SUFFIX}")
        self._full.save(full, args=ocp.args.StandardSave(state), force=True)

    def wait(self) -> None:
        self._compact.wait_until_finished()
        self._full.wait_until_finished()

    def close(self) -> None:
        self.wait()
        self._compact.close()
        self._full.close()


def make_saver(backend: str = "msgpack"):
    """Training-driver saver factory (config.checkpoint_backend)."""
    if backend == "orbax":
        return OrbaxCheckpointer()
    if backend in ("msgpack", None, "none"):
        return AsyncCheckpointer()
    raise ValueError(f"Unknown checkpoint backend: {backend!r}")


def load_compact(path_or_dir: str, template: Params) -> Params:
    """Load a compact checkpoint into the shape of `template`.

    Dispatches on the on-disk artifact: msgpack file, orbax directory, or
    a reference TF `model_compact-N` checkpoint (converted in memory via
    utils.tf_checkpoint — the parity path for published COMIC models)."""
    path = _resolve(path_or_dir, COMPACT_PREFIX)
    if path.endswith(_TF_SUFFIX):
        return _tf_reference_restore(path[: -len(_TF_SUFFIX)], template)
    if path.endswith(_ORBAX_SUFFIX):
        return _orbax_restore(path, template)
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def _tf_reference_restore(tf_path: str, template: Params) -> Params:
    from ..utils import tf_checkpoint as tfc

    if not (isinstance(template, dict) and "encoder" in template
            and "decoder" in template):
        raise ValueError(
            f"{tf_path} is a TF checkpoint, but the restore target is not "
            "a full model params tree — convert it explicitly "
            "(utils.tf_checkpoint) instead.")
    # cheap name-only probe first: a CNN-only slim checkpoint (no Model/
    # scope) must fall through to restore_model's CNN branch without
    # paying a full tensor materialization here
    if not any(n.startswith("Model/")
               for n in tfc.reference_checkpoint_names(tf_path)):
        raise ValueError(
            f"No `Model/` variables in {tf_path} — not a reference "
            "trained-model checkpoint.")
    return tfc.convert_reference_tree(
        tfc.load_reference_checkpoint_vars(tf_path), template)


def load_full(path_or_dir: str, template_state: Dict[str, Any]
              ) -> Dict[str, Any]:
    path = _resolve(path_or_dir, FULL_PREFIX)
    if path.endswith(_TF_SUFFIX):
        raise ValueError(
            f"{path} is a reference TF FULL checkpoint (graph + optimizer "
            "slots); resuming reference optimizer state is not supported. "
            "Restore the model variables from the matching model_compact-N "
            "instead (checkpoint_path without resume).")
    if path.endswith(_ORBAX_SUFFIX):
        return _orbax_restore(path, template_state)
    with open(path, "rb") as f:
        return serialization.from_bytes(template_state, f.read())


def _resolve(path_or_dir: str, prefix: str) -> str:
    if os.path.isfile(path_or_dir):
        return path_or_dir
    if path_or_dir.endswith(_ORBAX_SUFFIX) and os.path.isdir(path_or_dir):
        return path_or_dir
    for suffix in (_SUFFIX, _ORBAX_SUFFIX, _TF_SUFFIX):
        if os.path.exists(path_or_dir + suffix):
            return path_or_dir + suffix
    names = list_checkpoints(path_or_dir, prefix)
    if not names:
        raise FileNotFoundError(
            f"No {prefix}* checkpoints under {path_or_dir}")
    base = os.path.join(path_or_dir, names[-1])
    for suffix in (_SUFFIX, _ORBAX_SUFFIX, _TF_SUFFIX):
        if os.path.exists(base + suffix):
            return base + suffix
    return base + _ORBAX_SUFFIX


def restore_with_excludes(params: Params, restored: Params,
                          exclude_scopes: Optional[str]) -> Params:
    """Merge `restored` into `params`, skipping excluded scopes
    (model_base.py:452-470 filter_variables semantics, regex search)."""
    scopes = _normalize_scopes(exclude_scopes)
    if not scopes:
        return restored
    pats = [re.compile(sc) for sc in scopes]

    def merge(path, old, new):
        s = path_string(path)
        return old if any(p.search(s) for p in pats) else new

    return jax.tree_util.tree_map_with_path(merge, params, restored)


def restore_model(params: Params, checkpoint_path: Optional[str], *,
                  resume: bool = False,
                  exclude_scopes: Optional[str] = None,
                  opt_state: Any = None,
                  ) -> Tuple[Params, Any, int, str]:
    """The reference's 3-way restore (model_base.py:422-490).

    Returns (params, opt_state, start_step, mode) where mode is one of
    'scratch' | 'resume' | 'model' | 'cnn'.
    """
    if not checkpoint_path:
        return params, opt_state, 0, "scratch"

    if resume and not exclude_scopes:
        state_tpl = {"params": params, "step": np.int64(0)}
        if opt_state is not None:
            state_tpl["opt_state"] = opt_state
        state = load_full(checkpoint_path, state_tpl)
        return (state["params"], state.get("opt_state", opt_state),
                int(state["step"]), "resume")

    # Resolve first so error handling can distinguish "not a full-model
    # artifact -> try the CNN branch" from genuine conversion failures
    # (e.g. a reference TF checkpoint paired with the wrong config MUST
    # fail loudly with its shape-mismatch error, not be laundered into a
    # confusing CNN-branch message).
    resolved = None
    try:
        resolved = _resolve(checkpoint_path, COMPACT_PREFIX)
    except FileNotFoundError:
        pass
    if resolved and resolved.endswith(_TF_SUFFIX):
        from ..utils import tf_checkpoint as tfc

        tf_path = resolved[: -len(_TF_SUFFIX)]
        if any(n.startswith("Model/")
               for n in tfc.reference_checkpoint_names(tf_path)):
            # full reference model: converter errors propagate untouched
            restored = tfc.convert_reference_tree(
                tfc.load_reference_checkpoint_vars(tf_path), params)
            merged = restore_with_excludes(params, restored, exclude_scopes)
            return merged, opt_state, 0, "model"
        # no Model/ scope: a raw slim CNN checkpoint -> CNN branch below
    compact_err: Optional[BaseException] = None
    if resolved is not None and not resolved.endswith(_TF_SUFFIX):
        try:
            restored = load_compact(resolved, params)
            merged = restore_with_excludes(params, restored, exclude_scopes)
            return merged, opt_state, 0, "model"
        except ValueError as e:
            compact_err = e  # maybe a CNN-only msgpack -> CNN branch below

    # CNN-only restore: a converted slim checkpoint holding just the
    # encoder/cnn subtree (model_base.py:471-484), or a vanilla slim TF
    # ImageNet checkpoint converted in memory (root scope auto-detected).
    cnn_tpl = params["encoder"]["cnn"]
    path = checkpoint_path
    try:
        if os.path.isdir(path):
            cands = [f for f in os.listdir(path)
                     if f.endswith(_SUFFIX) or f.endswith(_TF_SUFFIX)]
            if not cands:
                raise FileNotFoundError(f"No checkpoint under {path}")
            # natural order, matching list_checkpoints: a lexicographic
            # sort would pick model_compact-9 over model_compact-10
            path = os.path.join(path, sorted(cands, key=natural_key)[-1])
        if path.endswith(_TF_SUFFIX):
            path = path[: -len(_TF_SUFFIX)]
        if os.path.exists(path + _TF_SUFFIX):
            from ..utils import tf_checkpoint as tfc

            tree = tfc._detect_cnn_tree(
                tfc.load_reference_checkpoint_vars(path), "", cnn_tpl)
            cnn = tfc.convert_slim_tree(tree, cnn_tpl)
        else:
            with open(path, "rb") as f:
                cnn = serialization.from_bytes(cnn_tpl, f.read())
    except Exception as cnn_err:
        if compact_err is not None:
            # don't launder a genuine full-model mismatch (e.g. a compact
            # msgpack from a different rnn config) into a confusing
            # CNN-branch error: surface BOTH failures
            raise ValueError(
                f"Checkpoint {resolved!r} failed the full-model restore "
                f"({compact_err}) AND the CNN-only fallback ({cnn_err}). "
                "The first error is usually the real one (config/"
                "checkpoint mismatch).") from compact_err
        raise
    out = dict(params)
    out["encoder"] = dict(params["encoder"])
    out["encoder"]["cnn"] = cnn
    # the reference's CNN branch ALSO filters exclude_patterns
    # (model_base.py:471-484 filter_variables), so an excluded scope keeps
    # its initializer even when the checkpoint covers it
    out = restore_with_excludes(params, out, exclude_scopes)
    return out, opt_state, 0, "cnn"


def save_cnn_checkpoint(path: str, cnn_params: Params) -> None:
    """Write an encoder-only checkpoint (the pretrained-CNN artifact)."""
    _atomic_write(path, serialization.to_bytes(_to_numpy(cnn_params)))
