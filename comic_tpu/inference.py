"""Inference driver: checkpoint sweep -> on-device beam search -> metrics.

Equivalent of the reference inference layer (/root/reference/src/infer_fn.py:
78-315 run_inference / evaluate_model / evaluate_captions), with the decode
path fully on device: uint8 batch -> fused preprocessing -> Inception ->
batched beam search in ONE jitted program. Artifacts match the reference:

  - save dir  `infer_{set}_beam_{B}_lpen_{L}` under the experiment dir
  - caption JSON `captions___{ckpt}.json` (COCO submission format)
  - `infer_speed.txt` captions/sec line per run (infer_fn.py:176-184)
  - attention-map pickle `outputs___{ckpt}.pkl` (optional)
  - metric_scores.{txt,csv} + detailed JSON via evaluation.coco_eval
"""

from __future__ import annotations

import os
import pickle
import re
import time
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .configuration import Config
from .data.pipeline import InferencePipeline
from .data.preprocessing import preprocess_for
from .decoding import beam_search, greedy_or_sample
from .evaluation.coco_eval import (
    evaluate_captions,
    write_caption_json,
    write_score_artifacts,
)
from .models.captioner import build_model_spec, init_params, max_decode_steps
from .tokenization import Vocabulary, ids_to_captions
from .training import checkpoints as ckpt

pjoin = os.path.join


def image_id_from_path(filepath: str):
    """Reference id rules (infer_fn.py:140-148): a path containing '@'
    (insta) keeps its STRING basename; otherwise the FIRST '_'-prefixed
    digit run in the name is the int COCO id (P_COCO = (?<=_)\\d+,
    findall()[0] — first match, not the trailing number). Documented
    divergences: we search the basename rather than the whole relative
    path (a dataset dir like 'run_01/' must not become the id), and a
    name with neither '@' nor digits yields the string stem instead of
    the reference's ValueError (forgiving for ad-hoc inference dirs)."""
    stem = os.path.splitext(os.path.basename(filepath))[0]
    if "@" in stem:
        return stem
    m = re.search(r"(?<=_)\d+", stem)
    return int(m.group(0)) if m else stem


def infer_dir_name(config: Config) -> str:
    lpen = config.infer_length_penalty_weight or 0.0
    return (f"infer_{config.infer_set}_beam_{config.infer_beam_size}"
            f"_lpen_{lpen}")


def _ckpt_name(ckpt_path: str) -> str:
    """Suffixless checkpoint name for artifact keys — the same name no
    matter which backend's path (msgpack file / orbax dir) was given."""
    name = os.path.basename(ckpt_path.rstrip(os.sep))
    for suffix in (ckpt._SUFFIX, ckpt._ORBAX_SUFFIX, ckpt._TF_SUFFIX):
        if name.endswith(suffix):
            name = name[: -len(suffix)]
    return name


def _refuse_multiprocess() -> None:
    """Inference is embarrassingly parallel across hosts (no cross-host
    collectives), but this serving path assumes a single process: feeding
    per-host numpy into a globally sharded jit is rejected by multi-process
    JAX, and the output ids of a cross-host mesh would not be
    host-addressable. Must run BEFORE mesh construction / checkpoint load:
    `make_mesh_for_batch` raises a confusing divisibility ValueError under
    multi-process, and loading params before refusing wastes the host."""
    if jax.process_count() > 1:
        raise NotImplementedError(
            "serving under multi-process jax.distributed is not "
            "supported — launch inference as a single-process job per "
            "host (its devices still run data-parallel).")


def make_serve_fn(spec, config: Config, steps: int, mesh=None,
                  collect_alignments: bool = True):
    """Build the jitted serving fn: (params, images_u8) -> (ids, alignments).

    With a mesh, the image batch is declared batch-sharded and params
    replicated via `in_shardings`, so jit performs the sharded async
    host->device transfer itself (never `device_put` in the serving loop —
    see CLAUDE.md) and the decode runs data-parallel over all devices.

    With collect_alignments=False the attention-map history (the largest
    decode output: (B, H, T, L) f32) is neither stacked per step nor
    backtracked — use when the caller won't pickle attention maps.
    """
    h, w = config.cnn_input_size
    beam = int(config.infer_beam_size)
    lpen = float(config.infer_length_penalty_weight or 0.0)
    preprocess = preprocess_for(config.cnn_name)

    early = bool(config.get("infer_early_exit"))
    # traced shapes are GLOBAL under jit: the VMEM-spill fence needs the
    # data-parallel shard count to judge the per-device footprint
    dp = mesh.size if mesh is not None else 1

    def serve(params, images_u8):
        images = preprocess(images_u8, jax.random.PRNGKey(0), h, w,
                            False)
        if beam > 1:
            top, _ = beam_search(params, spec, images, beam_size=beam,
                                 max_steps=steps, length_penalty=lpen,
                                 collect_alignments=collect_alignments,
                                 early_exit=early, dp_shards=dp)
        else:
            top = greedy_or_sample(params, spec, images, max_steps=steps,
                                   collect_alignments=collect_alignments,
                                   early_exit=early, dp_shards=dp)
        if not collect_alignments:
            return top.ids, None  # skip the zero placeholder entirely
        return top.ids, top.alignments

    if mesh is not None:
        _refuse_multiprocess()  # defense in depth for direct callers
        from .parallel.mesh import batch_sharding, replicated

        return jax.jit(serve, in_shardings=(replicated(mesh),
                                            batch_sharding(mesh)))
    return jax.jit(serve)


def run_inference(config: Config, ckpt_path: str,
                  save_attention: bool = False,
                  serve=None, pipe=None) -> Tuple[str, str]:
    """Generate captions for the configured infer set with one checkpoint.

    `serve`/`pipe` can be passed in to reuse the compiled decode program and
    the file list across a checkpoint sweep (weights are an argument, so one
    compilation serves every checkpoint — the reference rebuilds its graph
    per checkpoint, infer.py:104-138).

    Returns (save_dir, caption_json_path).
    """
    _refuse_multiprocess()  # before ckpt load / mesh build (both would fail confusingly)
    vocab = Vocabulary.from_str_itow(config.wtoi, config.itow)
    spec = build_model_spec(config, vocab)
    params = init_params(jax.random.PRNGKey(0), spec)
    params = ckpt.load_compact(ckpt_path, params)

    own_pipe = pipe is None
    if own_pipe:  # same ownership test as the close below ('pipe or ...'
        # would silently rebuild — and never close — a falsy empty pipe)
        pipe = InferencePipeline(config)
    try:
        # serve-fn construction sits INSIDE the try: a mesh-divisibility
        # ValueError here must still close the owned pipe (packed-h5
        # handle + prefetch worker), or a retry loop over candidate
        # configs accumulates open descriptors
        steps = max_decode_steps(config, vocab)
        if serve is None:
            from .parallel.mesh import make_mesh_for_batch

            serve = make_serve_fn(spec, config, steps,
                                  mesh=make_mesh_for_batch(
                                      config.batch_size_infer,
                                      limit=int(config.get("num_data_shards")
                                                or 0)),
                                  collect_alignments=save_attention)

        ckpt_name = _ckpt_name(ckpt_path)
        save_dir = pjoin(config.log_path, infer_dir_name(config))
        os.makedirs(save_dir, exist_ok=True)

        all_ids: List = []
        all_caps: List[str] = []
        # reference raw-outputs pickle structure (infer_fn.py:107-151):
        # three filename-keyed dicts; 'attention' capped by
        # config.infer_attention_max_images (-1 = full reference output)
        raw_outputs: Dict = {"captions": {}, "attention": {}, "image_ids": {}}
        def consume(ids, attn, files):
            caps = ids_to_captions(np.asarray(ids), config.token_type, vocab,
                                   config.radix_base)
            for f, c in zip(files, caps):
                all_ids.append(image_id_from_path(f))
                all_caps.append(c)
            if save_attention:
                if attn is None:
                    raise ValueError(
                        "save_attention=True but the serve fn returned no "
                        "alignment maps — it was built with "
                        "collect_alignments=False; rebuild via "
                        "make_serve_fn(..., collect_alignments=True).")
                limit = config.get("infer_attention_max_images")
                limit = 4 if limit is None else int(limit)  # 0 = maps for none
                maps = None
                if limit < 0 or len(raw_outputs["attention"]) < limit:
                    maps = np.asarray(attn)
                for j, (f, c) in enumerate(zip(files, caps)):
                    raw_outputs["captions"][f] = c
                    raw_outputs["image_ids"][f] = image_id_from_path(f)
                    if maps is not None and (
                            limit < 0 or len(raw_outputs["attention"]) < limit):
                        raw_outputs["attention"][f] = maps[j]
            return len(caps)

        from .parallel.mesh import start_host_fetch

        n_done = 0
        t0 = time.time()
        pending = None  # one-batch software pipeline: convert batch i's ids
        # on host while the device decodes batch i+1 (a synchronous per-batch
        # fetch costs a full tunnel round trip — CLAUDE.md)
        for images, files in iter(pipe):
            # raw numpy in: jit shards + transfers per its in_shardings
            # (jnp.asarray would commit the batch to device 0 and force a
            # per-batch reshard — CLAUDE.md hot-loop rule)
            ids, attn = serve(params, images)
            start_host_fetch(ids)
            if pending is not None:
                # consume BEFORE the attention-prefetch decision below: it
                # fills raw_outputs['attention'] for the previous batch, so
                # the cap check sees the current count (a stale count would
                # async-fetch one full (B,H,T,L) f32 batch past the cap —
                # 0.1-1.3 s wasted on the ~40 MB/s tunnel)
                n_done += consume(*pending)
            if attn is not None:
                # alignment maps are big ((B,H,T,L) f32) — only fetch while
                # the attention cap still wants them
                limit = config.get("infer_attention_max_images")
                limit = 4 if limit is None else int(limit)
                if limit < 0 or len(raw_outputs["attention"]) < limit:
                    start_host_fetch(attn)
            pending = (ids, attn, files)
        if pending is not None:
            n_done += consume(*pending)
        dt = time.time() - t0

        if len(set(map(str, all_ids))) != len(all_ids):
            raise AssertionError("Duplicate image ids in inference output.")

        json_path = pjoin(save_dir, f"captions___{ckpt_name}.json")
        write_caption_json(json_path, all_ids, all_caps)
        with open(pjoin(save_dir, "infer_speed.txt"), "a") as f:
            f.write(f"{ckpt_name}: {n_done / max(dt, 1e-9):.2f} captions/sec "
                    f"({n_done} images in {dt:.1f}s)\n")
        if save_attention and raw_outputs["captions"]:
            with open(pjoin(save_dir, f"outputs___{ckpt_name}.pkl"), "wb") as f:
                pickle.dump(raw_outputs, f, pickle.HIGHEST_PROTOCOL)
    finally:
        if own_pipe:  # callers who pass a pipe own its lifetime;
            # close on error paths too (the packed-h5 handle and
            # prefetch worker must not outlive a failed run)
            pipe.close()
    return save_dir, json_path


def evaluate_model(config: Config, ckpt_path: str,
                   annotations_file: Optional[str] = None,
                   jar_dir: str = "", serve=None, pipe=None,
                   run_infer: bool = True, get_metric_score: bool = True,
                   save_attention: bool = False,
                   require_ptb_jar: bool = False
                   ) -> Optional[Dict[str, float]]:
    """run_inference + metric scoring + artifacts (infer_fn.py:188-292).

    Skips work already done (existing caption JSON reused). The reference's
    `run_inference` / `get_metric_score` toggles (infer.py:46-50) select
    which halves run. Returns scores (None when scoring is disabled or no
    annotation file is available)."""
    ckpt_name = _ckpt_name(ckpt_path)
    save_dir = pjoin(config.log_path, infer_dir_name(config))
    json_path = pjoin(save_dir, f"captions___{ckpt_name}.json")
    if not os.path.exists(json_path):
        if not run_infer:
            print(f"WARNING: no caption JSON for {ckpt_name} and "
                  "run_inference=False; skipping.")
            return None
        _, json_path = run_inference(config, ckpt_path,
                                     save_attention=save_attention,
                                     serve=serve, pipe=pipe)

    if not get_metric_score:
        return None
    if annotations_file is None:
        annotations_file = config.get("annotations_file")
    if not annotations_file or not os.path.exists(annotations_file):
        print("WARNING: no annotation file; skipping metric scoring.")
        return None
    scores, img_to_eval = evaluate_captions(annotations_file, json_path,
                                            jar_dir,
                                            require_ptb_jar=require_ptb_jar)
    write_score_artifacts(save_dir, ckpt_name, scores, img_to_eval)
    return scores


def sweep_checkpoints(config: Config,
                      annotations_file: Optional[str] = None,
                      jar_dir: str = "",
                      checkpoints: str = "all",
                      run_infer: bool = True,
                      get_metric_score: bool = True,
                      save_attention: bool = False,
                      require_ptb_jar: bool = False
                      ) -> Dict[str, Dict[str, float]]:
    """Evaluate the reference's checkpoint selection: all compact ckpts
    (last 12 when more than 20 exist, infer.py:90-97), or an explicit
    comma-separated list of checkpoint numbers (`--infer_checkpoints`,
    infer.py:37-38,99-102)."""
    if run_infer:
        _refuse_multiprocess()  # refuse before any checkpoint/pipeline work
    if checkpoints and checkpoints != "all":
        nums = [s for s in str(checkpoints).split(",") if s]
        if not nums:
            raise ValueError("`infer_checkpoints` must be 'all' or a "
                             "comma-separated list of checkpoint numbers.")
        names = [ckpt.COMPACT_PREFIX + n for n in nums]
    else:
        names = ckpt.select_eval_checkpoints(config.log_path)
    if not names:
        raise FileNotFoundError(
            f"No compact checkpoints under {config.log_path}")
    from .parallel.mesh import make_mesh_for_batch

    serve = pipe = None
    if run_infer:
        vocab = Vocabulary.from_str_itow(config.wtoi, config.itow)
        spec = build_model_spec(config, vocab)
        serve = make_serve_fn(
            spec, config, max_decode_steps(config, vocab),
            mesh=make_mesh_for_batch(
                config.batch_size_infer,
                limit=int(config.get("num_data_shards") or 0)),
            collect_alignments=save_attention)
        pipe = InferencePipeline(config)
    results = {}
    try:
        for name in names:
            # suffixless: load_compact resolves msgpack/orbax/TF on disk
            path = pjoin(config.log_path, name)
            json_done = os.path.exists(
                pjoin(config.log_path, infer_dir_name(config),
                      f"captions___{name}.json"))
            if run_infer and not json_done:
                try:
                    # one pruned/mistyped --infer_checkpoints number
                    # shouldn't throw away the checkpoints already
                    # evaluated — but ONLY checkpoint resolution is
                    # forgiven; dataset/annotation errors inside
                    # evaluate_model must propagate (the reference
                    # existence-checks just the ckpt .index,
                    # infer.py:92-97)
                    ckpt._resolve(path, ckpt.COMPACT_PREFIX)
                except FileNotFoundError as e:
                    print(f"WARNING: skipping {name}: {e}")
                    continue
            scores = evaluate_model(config, path, annotations_file,
                                    jar_dir, serve=serve, pipe=pipe,
                                    run_infer=run_infer,
                                    get_metric_score=get_metric_score,
                                    save_attention=save_attention,
                                    require_ptb_jar=require_ptb_jar)
            if scores is not None:
                results[name] = scores
    finally:
        if pipe is not None:
            pipe.close()
    return results
