"""DOWNSTREAM training-trajectory parity vs the PyTorch reference.

Round-3 verdict ask #8: mirror tools/parity_trajectory.py for the
MaskFormer step. From the SAME transplanted full-stack init
(utils.torch_convert.convert_maskformer_state — the whole state dict:
incomplete-fusion ViT backbone + MSDeformAttn pixel decoder + mask2former
query decoder), on IDENTICAL inputs, targets, per-step modality subsets
and token masks, run N AdamW steps of

  * the reference loop (maskformer_train_ins_vit.py:185-239 semantics:
    SetCriterion{labels,masks} x weight_dict {ce 2.0, mask 5.0, dice 5.0},
    scipy Hungarian matching, total = 0.3 ce + 0.3 dice + 0.4 mask)
    under torch-CPU, and
  * this framework's set_criterion with match_mode='exact' (the same
    scipy assignment via pure_callback) under JAX-CPU,

and compare the loss curves step for step.

The two stochastic inputs the frameworks cannot share are PointRend's
sampled point coordinates (criterion_ins.py get_uncertain_point_coords_
with_randomness; 12544 points/mask => ~1/sqrt(12544) ≈ 1% estimator
noise) — so the tolerance here is a few percent, wider than the pretrain
trajectory's (whose losses are deterministic given masks).

The reference's per-step randomness (random.sample modality subset,
generate_random_masks token masks — multimae_big_imcomplete.py:542-594)
is pinned by drawing both host-side once and injecting them: a module-
level `random` stub + a bound-method override returning the predrawn
masks with the reference's own argsort bookkeeping.

Usage:
    python tools/parity_trajectory_downstream.py --steps 50 \
        --out PARITY_TRAJ.json        # merges under key 'downstream'
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

DOMAINS = ("s1", "s2", "dem")
CHANNELS = {"s1": 1, "s2": 3, "dem": 1}
IMG, PATCH = 256, 16
N_P = (IMG // PATCH) ** 2  # 256 tokens per modality
K, CONV, QUERIES, ENC, DEC, FFN = 3, 64, 10, 1, 3, 256
LR = 1e-4
NUM_POINTS = 12544


def draw_step_masks(rng: np.random.Generator, n_steps: int):
    """Per-step (present subset, task masks): the reference's semantics —
    a uniform 1..T-modality subset, int(0.9 * present tokens) visible,
    Dirichlet budget over present tasks (multimae_big_imcomplete.py:542-594
    + generate_random_masks :174-247)."""
    steps = []
    for _ in range(n_steps):
        sz = int(rng.integers(1, len(DOMAINS) + 1))
        present = sorted(rng.choice(len(DOMAINS), sz, replace=False).tolist())
        e_i = int(0.9 * sz * N_P)
        budget = rng.dirichlet(np.ones(sz))
        per = np.floor(budget * e_i).astype(int)
        per = np.minimum(per, N_P)
        # distribute the rounding remainder
        for _ in range(e_i - per.sum()):
            room = np.flatnonzero(per < N_P)
            per[room[rng.integers(len(room))]] += 1
        masks = {d: np.ones(N_P, np.int64) for d in DOMAINS}
        for j, t in enumerate(present):
            vis = rng.permutation(N_P)[: per[j]]
            masks[DOMAINS[t]][vis] = 0
        steps.append({"present": present, "masks": masks, "e": e_i})
    return steps


def make_targets(rng: np.random.Generator, batch: int):
    """Synthetic instance targets: 2 box blobs per image, labels in [0,K)."""
    targets = []
    for _ in range(batch):
        ms, labels = [], []
        for _ in range(2):
            y0, x0 = rng.integers(0, IMG - 90, 2)
            h, w = rng.integers(40, 90, 2)
            m = np.zeros((IMG, IMG), bool)
            m[y0 : y0 + h, x0 : x0 + w] = True
            ms.append(m)
            labels.append(int(rng.integers(0, K)))
        targets.append({"labels": np.asarray(labels, np.int64),
                        "masks": np.stack(ms)})
    return targets


class _RandomStub:
    """Replaces multimae_big_imcomplete's module-level `random` so the
    reference's per-step modality subset equals the predrawn one."""

    def __init__(self, step_plan):
        self.plan = step_plan
        self.i = 0

    def randint(self, a, b):
        return len(self.plan[self.i]["present"])

    def sample(self, pool, k):
        step = self.plan[self.i]
        self.i += 1
        return [DOMAINS[t] for t in step["present"]]


def run_torch(batches, targets_np, plan, steps):
    import torch

    from bench_reference_downstream_torch import (
        build_cfg, install_shims, load_reference)

    install_shims()
    mm_vit, crit, matcher_mod = load_reference()
    cfg = build_cfg()
    cfg.MODEL.SEM_SEG_HEAD.CONVS_DIM = CONV
    cfg.MODEL.SEM_SEG_HEAD.MASK_DIM = CONV
    cfg.MODEL.SEM_SEG_HEAD.TRANSFORMER_ENC_LAYERS = ENC
    cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES = K
    cfg.MODEL.MASK_FORMER.HIDDEN_DIM = CONV
    cfg.MODEL.MASK_FORMER.NUM_OBJECT_QUERIES = QUERIES
    cfg.MODEL.MASK_FORMER.DIM_FEEDFORWARD = FFN
    cfg.MODEL.MASK_FORMER.DEC_LAYERS = DEC + 1  # repo convention: cfg carries dec_layers+1 (MaskFormerModel_vit)

    torch.manual_seed(11)
    model = mm_vit.MaskFormerModel(cfg)
    state = {k: v.numpy().copy() for k, v in model.state_dict().items()}

    # pin the reference's python/torch randomness to the predrawn plan
    big = sys.modules["refds.modeling.multimae.multimae_big_imcomplete"]
    big.random = _RandomStub(plan)
    mask_iter = iter(plan * 10)

    def fake_generate(input_task_tokens, num_encoded_tokens, **kw):
        step = next(mask_iter)
        present = [DOMAINS[t] for t in step["present"]]
        b = next(iter(input_task_tokens.values())).shape[0]
        tm = {d: torch.from_numpy(step["masks"][d])[None] for d in present}
        mask_all = torch.cat([tm[d] for d in present], dim=1)
        # the reference's argsort bookkeeping (:219-243), stable for parity
        ids_shuffle = torch.from_numpy(
            np.argsort(mask_all.numpy(), axis=1, kind="stable"))
        ids_restore = torch.from_numpy(
            np.argsort(ids_shuffle.numpy(), axis=1, kind="stable"))
        ids_keep = ids_shuffle[:, :num_encoded_tokens]
        return ({d: m.repeat(b, 1) for d, m in tm.items()},
                ids_keep.repeat(b, 1), ids_restore.repeat(b, 1))

    model.backbone.generate_random_masks = fake_generate

    matcher = matcher_mod.HungarianMatcher(
        cost_class=2.0, cost_mask=5.0, cost_dice=5.0, num_points=NUM_POINTS)
    weight_dict = {"loss_ce": 2.0, "loss_mask": 5.0, "loss_dice": 5.0}
    for i in range(DEC):
        weight_dict.update({f"loss_ce_{i}": 2.0, f"loss_mask_{i}": 5.0,
                            f"loss_dice_{i}": 5.0})
    criterion = crit.SetCriterion(
        K, matcher=matcher, weight_dict=weight_dict, eos_coef=0.1,
        losses=["labels", "masks"], num_points=NUM_POINTS,
        oversample_ratio=3.0, importance_sample_ratio=0.75,
        device=torch.device("cpu"))
    opt = torch.optim.AdamW(model.parameters(), lr=LR, weight_decay=0.0)

    # ---- record the reference's remaining per-step randomness so the JAX
    # run can inject it (round-4 verdict Do#4: exact, not noise-bounded):
    #   * matcher assignments (level order: final, aux 0..DEC-1)
    #   * PointRend point coords drawn inside loss_masks (same order)
    step_coords: list = []
    step_matches: list = []
    orig_pts = crit.get_uncertain_point_coords_with_randomness

    def rec_pts(src, fn, n, osr, isr):
        c = orig_pts(src, fn, n, osr, isr)
        step_coords.append(c.detach().numpy().copy())
        return c

    crit.get_uncertain_point_coords_with_randomness = rec_pts
    inner_matcher = criterion.matcher

    class _RecMatcher(torch.nn.Module):
        @torch.no_grad()
        def forward(self, outputs, targets):
            idx = inner_matcher(outputs, targets)
            step_matches.append([
                (s.numpy().copy(), t.numpy().copy()) for s, t in idx])
            return idx

    criterion.matcher = _RecMatcher()

    tgt = [{"labels": torch.from_numpy(t["labels"]),
            "masks": torch.from_numpy(t["masks"])} for t in targets_np]
    losses, terms, injections = [], [], []
    model.train()
    for i in range(steps):
        nb = batches[i % len(batches)]
        x = {d: torch.from_numpy(nb[d].transpose(0, 3, 1, 2)).contiguous()
             for d in DOMAINS}
        outputs = model(x)
        step_coords.clear()
        step_matches.clear()
        ld = criterion(outputs, tgt)
        b = len(tgt)
        g = max(len(t["labels"]) for t in tgt)
        n_lvl = len(step_matches)
        matched = np.zeros((n_lvl, b, g), np.int32)
        coords = np.zeros((n_lvl, b * g, NUM_POINTS, 2), np.float32)
        for l in range(n_lvl):
            for bi, (srcs, tgts) in enumerate(step_matches[l]):
                for j, (s_, t_) in enumerate(zip(srcs, tgts)):
                    matched[l, bi, t_] = s_
                    # reference row order: batch-major, pairs in matcher
                    # order within the image (criterion_ins.py
                    # _get_src_permutation_idx)
                    coords[l, bi * g + t_] = step_coords[l][bi * g + j]
        injections.append({"matched": matched, "coords": coords})
        ce = dice = mask = 0.0
        for k_ in list(ld.keys()):
            if k_ in weight_dict:
                v = ld[k_] * weight_dict[k_]
                if k_.startswith("loss_ce"):
                    ce = ce + v
                elif k_.startswith("loss_dice"):
                    dice = dice + v
                else:
                    mask = mask + v
        loss = 0.3 * ce + 0.3 * dice + 0.4 * mask
        opt.zero_grad()
        loss.backward()
        opt.step()
        losses.append(float(loss.item()))
        terms.append((float(ce), float(dice), float(mask)))
    crit.get_uncertain_point_coords_with_randomness = orig_pts
    return state, losses, terms, injections


def run_jax(state, batches, targets_np, plan, steps, injections):
    import jax
    import jax.numpy as jnp
    import optax

    from incomplete_multimodal_fusion_tpu.losses.set_criterion import (
        SegTargets, set_criterion)
    from incomplete_multimodal_fusion_tpu.models.maskformer import (
        MaskFormerConfig, MaskFormerModel)
    from incomplete_multimodal_fusion_tpu.ops import masking
    from incomplete_multimodal_fusion_tpu.utils.torch_convert import (
        convert_maskformer_state)

    cfg = MaskFormerConfig(
        num_classes=K, conv_dim=CONV, mask_dim=CONV,
        transformer_enc_layers=ENC, num_queries=QUERIES, dec_layers=DEC,
        dim_feedforward=FFN)
    model = MaskFormerModel(cfg)
    params = jax.tree.map(jnp.asarray, convert_maskformer_state(
        state, DOMAINS, depth=12, enc_layers=ENC, dec_layers=DEC,
        hidden_dim=CONV))
    e_static = cfg.max_encoded_tokens

    g = 2  # padded instances per image
    tgts = SegTargets(
        labels=jnp.asarray(np.stack([t["labels"] for t in targets_np])),
        masks=jnp.asarray(
            np.stack([t["masks"] for t in targets_np]).astype(np.float32)),
        valid=jnp.ones((len(targets_np), g), bool),
    )
    tx = optax.adamw(LR, weight_decay=0.0)
    opt_state = tx.init(params)

    # loss mirrors train/downstream.make_downstream_train_step:197-224
    # with the ake150 weights (ce 2 / mask 5 / dice 5, mix 0.3/0.3/0.4).
    # The reference run's matcher assignments AND PointRend point coords are
    # injected (matched_override / point_coords_override), so every
    # remaining stochastic input is shared and the comparison is exact.
    def loss_fn(params, batch, mi, present, key, matched, coords):
        out = model.apply({"params": params}, batch, mask_info=mi,
                          num_encoded_tokens=e_static, present=present)
        out = jax.tree.map(lambda x: x.astype(jnp.float32), out)
        ld = set_criterion(out, tgts, key, num_classes=K, eos_coef=0.1,
                           num_points=NUM_POINTS, match_mode="exact",
                           cost_class=2.0, cost_mask=5.0, cost_dice=5.0,
                           matched_override=matched,
                           point_coords_override=coords)
        ce = 2.0 * sum(v for k_, v in ld.items() if k_.startswith("loss_ce"))
        dice = 5.0 * sum(
            v for k_, v in ld.items() if k_.startswith("loss_dice"))
        mask = 5.0 * sum(
            v for k_, v in ld.items() if k_.startswith("loss_mask"))
        total = 0.3 * ce + 0.3 * dice + 0.4 * mask
        return total, (ce, dice, mask)

    @jax.jit
    def step(params, opt_state, batch, mi, present, key, matched, coords):
        (loss, terms), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch, mi, present, key,
                                   matched, coords)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, terms

    losses, terms = [], []
    for i in range(steps):
        nb = batches[i % len(batches)]
        batch = {d: jnp.asarray(nb[d]) for d in DOMAINS}
        p = plan[i % len(plan)]
        b = batch["s1"].shape[0]
        tm = {d: jnp.broadcast_to(
            jnp.asarray(p["masks"][d], jnp.int32)[None], (b, N_P))
            for d in DOMAINS}
        mi = masking.mask_info_from_task_masks(tm, DOMAINS, e_static)
        present = jnp.asarray(
            [t in p["present"] for t in range(len(DOMAINS))])
        inj = injections[i]
        params, opt_state, loss, tms = step(
            params, opt_state, batch, mi, present, jax.random.PRNGKey(i),
            jnp.asarray(inj["matched"]), jnp.asarray(inj["coords"]))
        losses.append(float(loss))
        terms.append(tuple(float(v) for v in tms))
    return losses, terms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--n_batches", type=int, default=4)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    rng = np.random.default_rng(20260819)
    batches = [
        {d: rng.standard_normal(
            (args.batch, IMG, IMG, CHANNELS[d])).astype(np.float32)
         for d in DOMAINS}
        for _ in range(args.n_batches)
    ]
    plan = draw_step_masks(rng, args.steps)
    targets_np = make_targets(rng, args.batch)

    state, losses_t, terms_t, injections = run_torch(batches, targets_np,
                                                     plan, args.steps)
    losses_j, terms_j = run_jax(state, batches, targets_np, plan, args.steps,
                                injections)

    lt, lj = np.asarray(losses_t), np.asarray(losses_j)
    rel = np.abs(lt - lj) / np.abs(lt)
    result = {
        "steps": args.steps,
        "loss_torch_first": lt[0], "loss_jax_first": lj[0],
        "loss_torch_final": lt[-1], "loss_jax_final": lj[-1],
        "max_rel_loss_diff": float(rel.max()),
        "mean_rel_loss_diff": float(rel.mean()),
        "final_rel_loss_diff": float(rel[-1]),
        "loss_decreased_torch": bool(lt[-1] < lt[0]),
        "loss_decreased_jax": bool(lj[-1] < lj[0]),
        "note": "EXACT comparison (round-5): masks, modality subsets, "
                "matcher assignments AND PointRend point coords are all "
                "recorded from the reference run and injected into the JAX "
                "criterion — no framework-private randomness remains",
        "losses_torch": [float(v) for v in lt],
        "losses_jax": [float(v) for v in lj],
    }
    print(json.dumps({k: v for k, v in result.items()
                      if not k.startswith("losses_")}, indent=2))
    if args.out:
        merged = {}
        if os.path.exists(args.out):
            with open(args.out) as f:
                merged = json.load(f)
        if "steps" in merged and "downstream" not in merged:
            merged = {"pretrain": merged}
        merged["downstream"] = result
        with open(args.out, "w") as f:
            json.dump(merged, f, indent=2)


if __name__ == "__main__":
    main()
