"""Importance-reweighting post-processing of existing chains.

Capability parity with /root/reference/cobaya/post.py: given stored samples
and a ``post`` block with ``add``/``remove`` sub-inputs, remove priors /
likelihoods / derived params from the recorded log-posterior, recompute only
the *added* pipeline at every sample point, reweight by the log-posterior
difference (with a ``difflogmax`` stabilizing offset), and write
``<prefix>.post.<suffix>.N.txt`` products.

TPU-first: the added pipeline is compiled once with
``Model.make_logposterior_fn`` and evaluated for ALL sample points in one
vmapped jitted call per chain (the reference loops point-by-point over MPI
ranks) — post-processing is embarrassingly parallel and runs at device
throughput.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Union

import numpy as np

from .io.collection import SampleCollection
from .io.output import OutputReadOnly, get_output, load_samples
from .models.input_ import load_input_dict, update_info
from .models.model import Model
from .utils import conventions as cv
from .utils.log import LoggedError, get_logger, logger_setup
from .utils.tools import deepcopy_where_possible, str_to_list

log = get_logger("post")


@dataclasses.dataclass
class PostResult:
    sample: Union[SampleCollection, list]
    stats: dict
    logpost_weight_offset: float
    weights: Any

    def products(self):
        return {"sample": self.sample, "stats": self.stats,
                "weights": self.weights,
                "logpost_weight_offset": self.logpost_weight_offset}


def post(info_or_yaml_or_file, sample=None):
    """Reweight existing samples by modified priors/likelihoods.

    Returns ``(updated_info, PostResult)``.
    """
    info = load_input_dict(info_or_yaml_or_file)
    logger_setup(info.get("debug"))
    # multi-process runs: the batched device recompute already covers all
    # points at device throughput, so root does the work (and the disk
    # writes) and broadcasts the result summary — the reference instead
    # splits points across MPI ranks (post.py:622)
    from .parallel import state as pstate

    if pstate.more_than_one_process() and not info.pop("_post_root", False):
        if pstate.is_main_process():
            # run the root recursion as-if-serial so no collective
            # counters advance that the waiting peers never see
            try:
                with pstate.solo():
                    updated, result = post(dict(info, _post_root=True),
                                           sample=sample)
            except BaseException as exc:
                pstate.share_value({"error": f"{type(exc).__name__}: {exc}"},
                                   tag="post-result")
                pstate.sync_point(tag="post-exit")
                raise
            pstate.share_value({"updated": updated, "stats": result.stats,
                                "offset": result.logpost_weight_offset},
                               tag="post-result")
            pstate.sync_point(tag="post-exit")
            return updated, result
        shared = pstate.share_value(tag="post-result")
        if "error" in shared:
            pstate.sync_point(tag="post-exit")
            raise pstate.OtherProcessError(
                "post() failed on the root process: " + shared["error"]
            )
        out = shared["updated"], PostResult(
            sample=None, stats=shared["stats"],
            logpost_weight_offset=shared["offset"], weights=None,
        )
        pstate.sync_point(tag="post-exit")
        return out
    info.pop("_post_root", None)
    info_post = info.get("post")
    if not info_post:
        raise LoggedError(log, "No 'post' block given. Nothing to do!")
    add = deepcopy_where_possible(info_post.get("add") or {})
    remove = info_post.get("remove") or {}
    if "remove" in add:
        raise LoggedError(log, "'remove' block goes under 'post', not 'add'.")
    suffix = info_post.get("suffix")
    skip = info_post.get("skip") or 0
    thin = info_post.get("thin") or 1

    # --- 1. load the input sample + its model info ----------------------------
    # read-only: the input prefix legitimately "already has products"
    # (reference defers the overwrite check to the sampler, output.py:478-494)
    output_in = (OutputReadOnly(info["output"]) if info.get("output")
                 else get_output(prefix=None))
    if output_in:
        info_in = output_in.get_updated_info() or update_info(info)
    else:
        info_in = update_info(info)
    if sample is None:
        if not info.get("output"):
            raise LoggedError(log, "Either pass a sample or an 'output' "
                              "prefix to load chains from.")
        collections = load_samples(info["output"], skip=skip, thin=thin)
    else:
        collections = [sample] if isinstance(sample, SampleCollection) \
            else list(sample)
        if skip:
            collections = [c.skip_samples(skip) for c in collections]
        if thin != 1:
            collections = [c.thin_samples(thin) for c in collections]

    # tempered chains: detemper all together (shared weight normalization)
    # before reweighting, as the reference does (post.py:253-264)
    if any(getattr(c, "temperature", 1) != 1 for c in collections):
        log.info("Starting from tempered chains; detempering before "
                 "post-processing.")
        collections = [c.copy() for c in collections]
        collections[0].reset_temperature(with_batch=collections[1:])

    sampled_params = list(info_in.get("params") or {})
    # restrict to actually-sampled params using the first collection's schema
    chain_sampled = collections[0].sampled_params

    # --- 2. validate removals -----------------------------------------------------
    remove_likes = set(str_to_list((remove.get("likelihood") or {})))
    if isinstance(remove.get("likelihood"), dict):
        remove_likes = set(remove["likelihood"])
    remove_priors = set(str_to_list(remove.get("prior") or []))
    if isinstance(remove.get("prior"), dict):
        remove_priors = set(remove["prior"])
    remove_params = set(str_to_list(remove.get("params") or []))
    if isinstance(remove.get("params"), dict):
        remove_params = set(remove["params"])
    old_like_names = list(collections[0].like_names)
    old_prior_names = list(collections[0].prior_names)
    for name in remove_likes:
        if name not in old_like_names:
            raise LoggedError(
                log, "Cannot remove likelihood '%s': not in the input chain "
                "(%r)", name, old_like_names,
            )
    for name in remove_priors:
        if name not in old_prior_names or name == "0":
            raise LoggedError(
                log, "Cannot remove prior '%s' (available external priors: "
                "%r)", name, [p for p in old_prior_names if p != "0"],
            )

    # --- 3. build the ADD pipeline model -------------------------------------------
    if not add.get("likelihood"):
        add["likelihood"] = {}
    add.setdefault("params", {})
    add["likelihood"].setdefault("one", None)
    add_updated = update_info(dict(add), add_aggr_chi2=False)
    # sampled params of the chain must exist in the add-model so columns map
    params_for_model = {}
    for p in chain_sampled:
        params_for_model[p] = (info_in.get("params") or {}).get(
            p, {"prior": [-np.inf, np.inf]}
        )
    params_for_model.update(add_updated.get("params") or {})
    for p in remove_params:
        params_for_model.pop(p, None)
    model_add = Model(
        params_for_model, add_updated.get("likelihood") or {},
        info_prior=add_updated.get("prior"),
        info_theory=add_updated.get("theory"),
        packages_path=info.get("packages_path"),
        post=True, skip_unused_theories=True,
        dropped_theory_params=None,
        matmul_precision=info.get("matmul_precision", "highest"),
    )
    add_like_names = [n for n in model_add.like_names if n != "one"]
    add_prior_names = [n for n in model_add.prior.names if n != "0"]
    add_derived_names = list(model_add.derived_names)

    import jax
    import jax.numpy as jnp

    from .ops import hoist as hoist_ops

    _fn_raw = model_add.make_logposterior_fn(clip_to_bounds=False)
    _d = len(model_add.parameterization.sampled_params())
    fn = hoist_ops.jit_with_consts(
        jax.vmap(_fn_raw),
        hoist_ops.device_consts(hoist_ops.collect(_fn_raw, np.zeros(_d))),
    )

    # --- 4. per-collection batched recomputation + reweighting ---------------------
    out_collections = []
    all_logdiffs = []
    per_coll_data = []
    for coll in collections:
        x = coll.sampled_values()
        logpost_new_parts, logpriors_new, loglikes_new, derived_new = (
            np.asarray(a) for a in fn(jnp.asarray(x, jnp.float32))
        )
        # removed contributions (per point)
        mlp_removed = sum(
            (coll[cv.minuslogprior_name(p)] for p in remove_priors),
            start=np.zeros(len(coll)),
        )
        chi2_removed = sum(
            (coll[cv.chi2_name(like)] for like in remove_likes),
            start=np.zeros(len(coll)),
        )
        # added contributions: external priors + likelihoods (skip 'one')
        ext_idx = [i + 1 for i, n in enumerate(model_add.prior.names[1:],
                                               start=0)]
        mlp_added = -logpriors_new[:, 1:].sum(axis=1) if (
            logpriors_new.shape[1] > 1
        ) else np.zeros(len(coll))
        like_idx = [i for i, n in enumerate(model_add.like_names)
                    if n != "one"]
        chi2_added = -2 * loglikes_new[:, like_idx].sum(axis=1) if like_idx \
            else np.zeros(len(coll))
        logdiff = (
            +0.5 * chi2_removed + mlp_removed
            - 0.5 * chi2_added - mlp_added
        )
        all_logdiffs.append(logdiff)
        per_coll_data.append((
            coll, logdiff, mlp_removed, chi2_removed, mlp_added, chi2_added,
            logpriors_new, loglikes_new, derived_new, like_idx,
        ))
    difflogmax = float(max(ld.max() for ld in all_logdiffs))
    if abs(difflogmax) < 1:
        difflogmax = 0.0

    out_prefix = info_post.get("output") or info.get("output")
    output_out = None
    if out_prefix:
        if not suffix:
            raise LoggedError(log, "Need a 'suffix' for post output.")
        output_out = get_output(prefix=out_prefix, force=bool(
            info.get("force")), resume=False,
            infix=f"post.{suffix}",
        )

    for i, (coll, logdiff, mlp_removed, chi2_removed, mlp_added, chi2_added,
            logpriors_new, loglikes_new, derived_new, like_idx) \
            in enumerate(per_coll_data):
        new_prior_names = [p for p in coll.prior_names
                           if p not in remove_priors] + add_prior_names
        new_like_names = [n for n in coll.like_names
                          if n not in remove_likes] + add_like_names
        kept_derived = [p for p in coll.derived_params
                        if p not in remove_params]
        new_derived = kept_derived + [
            p for p in add_derived_names if p not in kept_derived
        ]
        out = SampleCollection(
            name=str(i + 1), sampled_params=coll.sampled_params,
            derived_params=new_derived, prior_names=new_prior_names,
            like_names=new_like_names, temperature=1.0,
            output=output_out,
        )
        n = len(coll)
        rows = np.empty((n, len(out.columns)))
        weights_new = coll.weights * np.exp(logdiff - difflogmax)
        rows[:, 0] = weights_new
        rows[:, 1] = coll["minuslogpost"] - logdiff
        i0 = 2
        rows[:, i0:i0 + len(coll.sampled_params)] = coll.sampled_values()
        i0 += len(coll.sampled_params)
        for p in kept_derived:
            rows[:, i0] = coll[p]
            i0 += 1
        add_map = {p: j for j, p in enumerate(add_derived_names)}
        for p in new_derived:
            if p not in kept_derived:
                rows[:, i0] = derived_new[:, add_map[p]]
                i0 += 1
        # priors
        per_prior = []
        for p in coll.prior_names:
            if p not in remove_priors:
                per_prior.append(coll[cv.minuslogprior_name(p)])
        for j, p in enumerate(add_prior_names):
            per_prior.append(-logpriors_new[:, 1 + j])
        per_prior = np.array(per_prior).T if per_prior else np.zeros((n, 0))
        rows[:, i0] = per_prior.sum(axis=1)
        i0 += 1
        rows[:, i0:i0 + per_prior.shape[1]] = per_prior
        i0 += per_prior.shape[1]
        # likes
        per_chi2 = []
        for p in coll.like_names:
            if p not in remove_likes:
                per_chi2.append(coll[cv.chi2_name(p)])
        for j_local, j in enumerate(like_idx):
            per_chi2.append(-2 * loglikes_new[:, j])
        per_chi2 = np.array(per_chi2).T if per_chi2 else np.zeros((n, 0))
        rows[:, i0] = per_chi2.sum(axis=1)
        i0 += 1
        rows[:, i0:] = per_chi2
        keep = weights_new > 0
        out.append_rows(rows[keep])
        out.out_update()
        out_collections.append(out)

    weights_all = np.concatenate([c.weights for c in out_collections])
    stats = {
        "min_weight": float(weights_all.min()) if len(weights_all) else 0.0,
        "max_weight": float(weights_all.max()) if len(weights_all) else 0.0,
        "mean_weight": float(weights_all.mean()) if len(weights_all) else 0.0,
        "eff_samples": float(weights_all.sum() ** 2
                             / (weights_all ** 2).sum())
        if len(weights_all) else 0.0,
    }
    log.info("Post-processing done: %d points, efficiency %.3f",
             len(weights_all),
             stats["eff_samples"] / max(len(weights_all), 1))
    # the returned updated info is the combined OUTPUT model (input info
    # with removals applied and additions merged), as the reference's
    # ``out_combined`` (post.py:848)
    updated = deepcopy_where_possible(dict(info_in))
    upd_params = dict(updated.get("params") or {})
    for p in remove_params:
        upd_params.pop(p, None)
    upd_params.update(add_updated.get("params") or {})
    updated["params"] = upd_params
    upd_likes = dict(updated.get("likelihood") or {})
    for name in remove_likes:
        upd_likes.pop(name, None)
    upd_likes.update({k: v for k, v in
                      (add_updated.get("likelihood") or {}).items()
                      if k != "one"})
    updated["likelihood"] = upd_likes
    upd_priors = dict(updated.get("prior") or {})
    for name in remove_priors:
        upd_priors.pop(name, None)
    upd_priors.update(add_updated.get("prior") or {})
    if upd_priors:
        updated["prior"] = upd_priors
    updated["post"] = {"add": add_updated, "remove": remove,
                       "suffix": suffix}
    # post products are detempered: don't advertise the input run's
    # temperature, or reloading them would detemper a second time
    for sampler_block in (updated.get("sampler") or {}).values():
        if isinstance(sampler_block, dict):
            sampler_block.pop("temperature", None)
    if output_out:
        output_out.check_and_dump_info(None, updated, check_compatible=False)
        output_out.close()
    result = PostResult(
        sample=(out_collections[0] if len(out_collections) == 1
                else out_collections),
        stats=stats, logpost_weight_offset=difflogmax, weights=weights_all,
    )
    return updated, result
