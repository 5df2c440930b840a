"""The complete product pipeline as ONE integration test.

The reference runs its four stages as separate manual jobs (search.py →
Decoding/decode_autodeeplab.py → train.py → train_edm.py → eval.py) and has
no test that the chain composes. This test drives the whole loop at toy
scale: a mixed cell+path supernet is searched (bilevel), the architecture is
Viterbi/genotype-decoded, the DECODED network (not a shipped artifact) is
trained, an EDM is fitted on its features, and dynamic early-exit evaluation
runs with EDM gating — asserting each stage's artifact feeds the next.
"""
import numpy as np
import pytest

from auto_dynamic_deeplab_tpu.data import DataLoader, SyntheticSegmentation
from auto_dynamic_deeplab_tpu.models import ADD
from auto_dynamic_deeplab_tpu.models.path_supernet import ModelSearch
from auto_dynamic_deeplab_tpu.train.edm_trainer import make_edm_dataset, train_edm
from auto_dynamic_deeplab_tpu.train.evaluator import Evaluation
from auto_dynamic_deeplab_tpu.train.search_trainer import SearchConfig, SearchTrainer
from auto_dynamic_deeplab_tpu.train.trainer import TrainConfig, Trainer


def _loader(length, seed, batch_size=2, crop=33, **kw):
    return DataLoader(
        SyntheticSegmentation(length=length, crop_size=(crop, crop), seed=seed),
        batch_size=batch_size, num_workers=2, **kw,
    )


def test_full_product_chain(tmp_path):
    # ---- stage 1: bilevel NAS search on the mixed supernet (search.py) ----
    supernet = ModelSearch(
        19, num_layers=4, F=2, B=2, exit_layer=2, remat=False
    )
    cfg = SearchConfig(
        epochs=2, alpha_epoch=1, eval_interval=2,
        run_dir=str(tmp_path / "search"), lr=0.01,
    )
    searcher = SearchTrainer(
        supernet, _loader(4, 0, crop=65), _loader(4, 1, crop=65),
        _loader(2, 2, crop=65, shuffle=False, drop_last=False), cfg,
    )
    l0 = searcher.training(0)
    l1 = searcher.training(1)  # arch step moves alphas AND betas
    assert np.isfinite([l0, l1]).all()

    # ---- decode: betas → path (Viterbi), alphas → genotype ---------------
    decoded = searcher.decode_and_save(1)
    path, genotype = decoded["path"], decoded["genotype"]
    assert path.shape == (4,) and path[0] in (0, 1)
    assert genotype is not None and genotype.shape == (2 * 2, 2)
    # ops may include 'none' (decoding_formulas.py:98 "this can include
    # none op") — the decoded cell must build and run regardless

    # ---- stage 2: train the DECODED multi-exit network (train.py) --------
    model = ADD(
        [int(p) for p in path], [1], genotype, 19,
        F=2, B=2, low_level_layer=0, axis_name=None,
    )
    tcfg = TrainConfig(
        epochs=2, lr=0.02, eval_interval=2,
        run_dir=str(tmp_path / "train"), dataset="synthetic",
        data_parallel=False,
    )
    train_loader = _loader(8, 3, batch_size=4)
    trainer = Trainer(model, train_loader, _loader(2, 4, shuffle=False,
                                                   drop_last=False), tcfg)
    t0 = trainer.training(0)
    t1 = trainer.training(1)
    assert np.isfinite([t0, t1]).all()
    variables = {
        "params": trainer.state.params,
        "batch_stats": trainer.state.batch_stats,
    }

    # ---- stage 3: EDM on the trained backbone's features (train_edm.py) --
    feats, ents = make_edm_dataset(model, variables, _loader(8, 5, batch_size=4))
    assert feats.shape[0] == 8 and ents.shape == (8,)
    edm, edm_vars, edm_loss = train_edm(feats, ents, epochs=20, batch_size=4)
    assert np.isfinite(edm_loss)

    # ---- stage 4: static + EDM-gated dynamic evaluation (eval.py) --------
    evaluation = Evaluation(
        model, variables, num_classes=19, edm=edm, edm_variables=edm_vars
    )
    val_loader = _loader(4, 6, shuffle=False, drop_last=False)
    static = evaluation.validate(val_loader)
    assert len(static["miou"]) == 2
    assert all(0.0 <= m <= 1.0 for m in static["miou"])

    stats = evaluation.dynamic_inference(
        val_loader, threshold=1e9, confidence="edm"
    )
    assert stats["n_images"] == 4
    # conf <= huge threshold → every image exits at the first station
    assert stats["exit_histogram"][0] == 4 and stats["early_exit_rate"] == 1.0
    assert 0.0 <= stats["miou"] <= 1.0 and stats["fps"] > 0
