"""Orbax checkpoint/resume for the bi-encoder trainer.

Role parity note: the reference's resume story is DB result-presence
(SURVEY.md §5); training state has no DB row, so the trainer gets real
orbax checkpoints — save every N steps, auto-resume from latest.
"""

import numpy as np
import pytest

from autorag_research_tpu.models.encoder import EncoderConfig
from autorag_research_tpu.models.trainer import BiEncoderTrainer
from autorag_research_tpu.store.catalog import Catalog
from autorag_research_tpu.store.gt import or_all


@pytest.fixture
def catalog8(tmp_path):
    cat = Catalog(tmp_path / "ck.db")
    docs = [f"topic {chr(97 + i)} document body {i}" for i in range(8)]
    cat.add_chunks([{"id": i, "contents": d} for i, d in enumerate(docs)])
    cat.add_queries([{"id": i, "contents": f"find topic {chr(97 + i)}"} for i in range(8)])
    for i in range(8):
        cat.add_retrieval_gt(i, or_all([i]))
    return cat


CFG = EncoderConfig(vocab_size=512, hidden=32, layers=2, heads=2, max_len=8, out_dim=16)


def test_save_restore_roundtrip(catalog8, tmp_path):
    trainer = BiEncoderTrainer(CFG, lr=0.005, batch_size=8, optimizer="adamw")
    trainer.train(catalog8, epochs=3)
    ckdir = tmp_path / "ckpts"
    trainer.save_checkpoint(ckdir, 3)

    fresh = BiEncoderTrainer(CFG, lr=0.005, batch_size=8, optimizer="adamw", seed=99)
    step = fresh.restore_checkpoint(ckdir)
    assert step == 3
    # exact param equality after restore
    import jax

    for a, b in zip(jax.tree.leaves(trainer.params), jax.tree.leaves(fresh.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # opt_state structure (NamedTuple chain) survives
    assert jax.tree.structure(trainer._opt_state) == jax.tree.structure(fresh._opt_state)


def test_auto_resume_continues_step_count(catalog8, tmp_path):
    ckdir = tmp_path / "ckpts"
    t1 = BiEncoderTrainer(CFG, lr=0.005, batch_size=8)
    r1 = t1.train(catalog8, epochs=5, checkpoint_dir=ckdir, checkpoint_every=2)
    assert r1.steps == 5
    assert BiEncoderTrainer.latest_checkpoint(ckdir).name == "step_5"

    # a new trainer resumes at step 5 and max_steps counts TOTAL steps
    t2 = BiEncoderTrainer(CFG, lr=0.005, batch_size=8)
    r2 = t2.train(catalog8, epochs=10, max_steps=8, checkpoint_dir=ckdir)
    assert r2.steps == 3  # only the 3 missing steps ran
    assert BiEncoderTrainer.latest_checkpoint(ckdir).name == "step_8"

    # already at max_steps -> no-op
    t3 = BiEncoderTrainer(CFG, lr=0.005, batch_size=8)
    r3 = t3.train(catalog8, epochs=10, max_steps=8, checkpoint_dir=ckdir)
    assert r3.steps == 0


def test_resume_no_checkpoint_is_fresh_start(catalog8, tmp_path):
    t = BiEncoderTrainer(CFG, batch_size=8)
    assert t.restore_checkpoint(tmp_path / "nowhere") == 0
    r = t.train(catalog8, epochs=2, checkpoint_dir=tmp_path / "new")
    assert r.steps == 2
    assert BiEncoderTrainer.latest_checkpoint(tmp_path / "new").name == "step_2"
