"""North-rule gate: Spark pipeline vs the numpy reference oracle.

keep/drop F1 >= 0.99 (measured: 1.0), scrubbed-caption string equality,
dedup-flag equality, langid/ppl value equality — on the deterministic
synthetic image+caption table including every FIXTURES.md edge row.
Verified by `python -m pytest -x -q` per BASELINE.json input_hint.
"""

import numpy as np

from bioanalyzer_backend_spark import spec
from bioanalyzer_backend_spark.functions import langid, perplexity
from bioanalyzer_backend_spark.plans import pipeline as P
from bioanalyzer_backend_spark.rules import reference_impl as ri


def _expected_full(synth_images, artifacts_dir):
    import os
    exp = ri.expected_labels(synth_images)
    logp, langs = langid.load_model(os.path.join(artifacts_dir, "langid.npz"))
    lang, conf = langid.predict_batch(synth_images["caption"].tolist(), logp, langs)
    lm = perplexity.load_model(os.path.join(artifacts_dir, "lm.npz"))
    ppl = perplexity.ppl_batch(synth_images["caption"].tolist(), lm)
    exp["lang"] = lang
    exp["lang_conf"] = conf
    exp["ppl"] = ppl
    exp["keep_full"] = exp["keep"].values & (lang != langid.UNKNOWN) & (ppl <= spec.PPL_MAX)
    return exp


def test_pipeline_matches_oracle(spark, synth_images, synth_images_df,
                                 artifacts_dir):
    res = (P.quality_filter(synth_images_df, artifact_dir=artifacts_dir)
           .select("image_id", "keep", "keep_core", "lang", "lang_conf",
                   "ppl", "quality_score", "n_present", "scrubbed_caption",
                   "is_dup")
           .toPandas().sort_values("image_id").reset_index(drop=True))
    imgs = synth_images.sort_values("image_id").reset_index(drop=True)
    exp = _expected_full(imgs, artifacts_dir).sort_values("image_id").reset_index(drop=True)

    assert len(res) == len(exp)
    # exact per-row equality (stronger than the F1 >= 0.99 target)
    assert (res["keep_core"].values == exp["keep"].values).all()
    assert (res["keep"].values == exp["keep_full"].values).all()
    assert (res["scrubbed_caption"].values == exp["scrubbed_caption"].values).all()
    assert (res["is_dup"].values == exp["is_dup"].values).all()
    assert (res["lang"].values == exp["lang"].values).all()
    assert np.array_equal(res["quality_score"].values,
                          exp["quality_score"].values)
    assert np.allclose(res["ppl"].values, exp["ppl"].values, rtol=1e-12)

    # F1 (the BASELINE.json metric, here exactly 1.0)
    tp = int((res["keep"] & exp["keep_full"]).sum())
    fp = int((res["keep"] & ~exp["keep_full"]).sum())
    fn = int((~res["keep"] & exp["keep_full"]).sum())
    f1 = 2 * tp / (2 * tp + fp + fn)
    assert f1 >= 0.99

    # sanity: the filter actually filters (synth has junk/empty/sentinels)
    assert 0.5 < res["keep"].mean() < 0.95
    assert res["is_dup"].sum() > 0


def test_dedup_canonical_is_min_id(spark, synth_images, synth_images_df):
    res = (P.apply_dedup_flag(synth_images_df)
           .select("image_id", "phash", "is_dup").toPandas())
    canon = res.groupby("phash")["image_id"].transform("min")
    assert ((res["image_id"] == canon) == ~res["is_dup"]).all()


def test_bytes_pass_through_untouched(spark, synth_images, synth_images_df,
                                      artifacts_dir):
    """Binary pass-through invariant: decoded pixels identical (PSNR inf)."""
    from bioanalyzer_backend_spark.datagen.imgcodec import decode, psnr

    out = (P.quality_filter(synth_images_df, artifact_dir=artifacts_dir)
           .select("image_id", "bytes", "fmt").toPandas()
           .set_index("image_id"))
    src = synth_images.set_index("image_id")
    sample = src.sample(50, random_state=7)
    n_err = 0
    for iid, row in sample.iterrows():
        assert out.loc[iid, "bytes"] == row["bytes"]
        try:
            a = decode(bytes(row["bytes"]), row["fmt"])
            b = decode(bytes(out.loc[iid, "bytes"]), out.loc[iid, "fmt"])
            assert psnr(a, b) >= 40.0
        except ValueError:
            n_err += 1            # the declared-fmt-mismatch edge row
    assert n_err <= 1
