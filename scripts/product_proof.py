"""Trained-weights PRODUCT-CHAIN proof on a learnable synthetic task.

Every dynamic-inference number so far used random-init backbones (bench.py,
labeled as such). This script demonstrates the actual product loop the
reference ships (train.py -> train_edm.py -> eval.py:195-230):

  stage 2: train the flagship-topology ADD until val mIoU clearly climbs;
  stage 3: fit the EDM on REAL stage-2 features of the trained backbone;
  stage 4: EDM-gated dynamic eval — demonstrate
             gated mIoU >= first-exit static mIoU
             mean latency strictly between the per-exit latencies.

Runs on whatever backend is attached (TPU via the axon plugin, or CPU);
prints one JSON line for SCALE_r04.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from auto_dynamic_deeplab_tpu.models import ADD
    from auto_dynamic_deeplab_tpu.nas import AUTODEEPLAB_GENOTYPE, NETWORK_ARCH
    from auto_dynamic_deeplab_tpu.train import (
        create_train_state,
        lr_schedule,
        make_optimizer,
        make_single_device_train_step,
    )
    from auto_dynamic_deeplab_tpu.train.dynamic import DynamicInferenceEngine
    from auto_dynamic_deeplab_tpu.train.edm_trainer import (
        make_edm_dataset,
        train_edm,
    )
    from auto_dynamic_deeplab_tpu.utils.metrics import Evaluator

    t0 = time.monotonic()
    cfg = NETWORK_ARCH[2]
    d = int(os.environ.get("PROOF_HW", "65"))
    hw = (d, d)
    n_classes = 7
    epochs = int(os.environ.get("PROOF_EPOCHS", "120"))
    bs = 8
    model = ADD(
        cfg["path"], cfg["C_index"], AUTODEEPLAB_GENOTYPE, n_classes,
        F=8, B=5, low_level_layer=cfg["low_level_layer"],
    )

    # Task with a DEPTH gradient: labels quantize a LOW-frequency field that
    # only coarse context decodes, while the image carries strong HIGH-
    # frequency distractors — shallow exits are expected to be noisier than
    # the full-depth path, which is what makes confidence gating meaningful.
    def gen_item(seed):
        r = np.random.RandomState(seed)
        h, w = hw
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        field = np.zeros((h, w), np.float32)
        for _ in range(3):
            fx, fy = r.uniform(0.03, 0.09, 2)
            ph = r.uniform(0, 6.28)
            field += np.sin(fx * xx + fy * yy + ph)
        def hf():
            out = np.zeros((h, w), np.float32)
            for _ in range(3):
                fx, fy = r.uniform(0.6, 1.6, 2)
                ph = r.uniform(0, 6.28)
                out += np.sin(fx * xx + fy * yy + ph)
            return out
        image = np.stack(
            [field + 0.8 * hf(), np.roll(field, 3, 0) + 0.8 * hf(), hf()],
            axis=-1,
        ).astype(np.float32)
        q = (field - field.min()) / (np.ptp(field) + 1e-6) * n_classes
        label = np.clip(q.astype(np.int32), 0, n_classes - 1)
        return {"image": image, "label": label}

    train_items = [gen_item(1000 + i) for i in range(48)]
    val_items = [gen_item(9000 + i) for i in range(32)]
    train_batches = [
        {
            "image": np.stack([it["image"] for it in train_items[i : i + bs]]),
            "label": np.stack([it["label"] for it in train_items[i : i + bs]]),
        }
        for i in range(0, len(train_items), bs)
    ]

    tx = make_optimizer(
        lr_schedule("poly", 0.05, epochs, len(train_batches)), weight_decay=4e-5
    )
    state = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((1, *hw, 3), jnp.float32), tx
    )
    step = make_single_device_train_step(model, tx)

    @jax.jit
    def predict_all(variables, x):
        outs = model.apply(variables, x, train=False)  # NHWC logits per exit
        return [jnp.argmax(o, axis=-1) for o in outs]

    def val_miou(variables):
        evs = [Evaluator(n_classes) for _ in model.exit_layers]
        xb = jnp.asarray(np.stack([it["image"] for it in val_items]))
        preds = predict_all(variables, xb)
        for k, p in enumerate(preds):
            for j, it in enumerate(val_items):
                evs[k].add_batch(it["label"][None], np.asarray(p[j])[None])
        return [float(e.Mean_Intersection_over_Union()) for e in evs]

    untrained_mious = val_miou(
        {"params": state.params, "batch_stats": state.batch_stats}
    )
    first_ep_loss = None
    loss = float("nan")
    miou_curve = []
    for ep in range(epochs):
        losses = []
        for b in train_batches:
            state, metrics = step(
                state, {k: jnp.asarray(v) for k, v in b.items()}
            )
            losses.append(metrics["loss"])
        loss = float(np.mean([float(l) for l in losses]))
        if first_ep_loss is None:
            first_ep_loss = loss
        if (ep + 1) % max(epochs // 4, 1) == 0:
            variables = {
                "params": state.params, "batch_stats": state.batch_stats
            }
            miou_curve.append(
                {"epoch": ep, "loss": round(loss, 4),
                 "miou": [round(m, 4) for m in val_miou(variables)]}
            )
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    static_mious = val_miou(variables)

    # ---- stage 3: EDM on REAL trained-backbone features -------------------
    feats, ents = make_edm_dataset(
        model, variables, [{"image": b["image"]} for b in train_batches]
    )
    edm, edm_vars, edm_loss = train_edm(
        feats, ents, epochs=300, batch_size=8, lr=1e-3
    )

    # ---- stage 4: EDM-gated dynamic eval ----------------------------------
    engine = DynamicInferenceEngine(
        model, variables, edm=edm, edm_variables=edm_vars,
        num_classes=n_classes, use_pallas_stems=False,  # 65x65: XLA stems
    )
    # EDM confidences on val (decide_0 program, one scalar per image)
    d0e = engine._decide(0, hw, "edm", 0.0)
    confs = [
        float(np.asarray(d0e(jnp.asarray(it["image"][None]))[1])[0])
        for it in val_items
    ]
    thr = float(np.median(confs))  # ~half exit early by construction

    ev_gated = Evaluator(n_classes)
    exit_counts = [0] * len(model.exit_layers)
    for it in val_items:
        logits, exit_idx, _, _ = engine.infer(
            jnp.asarray(it["image"][None]), threshold=thr, confidence="edm"
        )
        pred = np.argmax(np.asarray(logits), axis=1)  # (N,C,H,W) class-lead
        ev_gated.add_batch(it["label"][None], pred)
        exit_counts[exit_idx] += 1
    gated_miou = float(ev_gated.Mean_Intersection_over_Union())

    # per-exit device latency (mean of a few timed runs — tiny images, so
    # wall-clock through block_until_ready is dominated by dispatch; report
    # both per-exit means and the gated mean from the same instrument)
    def timed(fn, runs=8):
        fn()  # warm
        t = time.perf_counter()
        for _ in range(runs):
            fn()
        return (time.perf_counter() - t) / runs

    x0 = jnp.asarray(val_items[0]["image"][None])
    t_early = timed(
        lambda: jax.block_until_ready(
            engine._head(model.exit_layers[0], hw)(d0e(x0)[0])
        )
    )
    t_full = timed(
        lambda: jax.block_until_ready(engine._final(hw)(d0e(x0)[0]))
    )
    rate0 = exit_counts[0] / max(sum(exit_counts), 1)
    mean_latency = rate0 * t_early + (1 - rate0) * t_full

    out = {
        "task": (
            "synthetic learnable: low-freq 7-class label field + high-freq "
            f"image distractors, {hw[0]}x{hw[1]}, F=8 flagship topology"
        ),
        "train": {
            "epochs": epochs,
            "first_epoch_loss": round(first_ep_loss, 4),
            "final_epoch_loss": round(loss, 4),
            "untrained_miou": [round(m, 4) for m in untrained_mious],
            "miou_curve": miou_curve,
        },
        "static_miou_per_exit": [round(m, 4) for m in static_mious],
        "edm_train_l1_loss": round(edm_loss, 4),
        "edm_gated": {
            "threshold_median": round(thr, 4),
            "exit_counts": exit_counts,
            "gated_miou": round(gated_miou, 4),
            "mean_latency_ms": round(mean_latency * 1e3, 2),
            "early_exit_latency_ms": round(t_early * 1e3, 2),
            "full_depth_latency_ms": round(t_full * 1e3, 2),
        },
        "proof": {
            "miou_climbs": bool(
                static_mious[-1] > 2 * max(untrained_mious[-1], 1.0 / n_classes / 4)
                and static_mious[-1] > untrained_mious[-1] + 0.05
            ),
            "gated_miou_ge_first_exit": bool(
                gated_miou >= static_mious[0] - 1e-6
            ),
            # the product claim (eval.py:195-230): dynamic inference holds
            # accuracy vs the FULL static model while cutting mean latency
            "gated_miou_ge_full_depth_static": bool(
                gated_miou >= static_mious[-1] - 1e-6
            ),
            "latency_between_exits": bool(
                t_early < mean_latency < t_full
            ),
        },
        "wall_s": round(time.monotonic() - t0, 1),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
