"""Padding-mask behavior of the encoders (TPU-native deviation, documented in
models/language_encoder.py: masked attention/pooling over real tokens,
sentences, and objects — the reference attends to zero-padded slots, making
outputs depend on batch composition)."""

import jax
import jax.numpy as jnp
import numpy as np

from text2loc_tpu.data.batch import ObjectSet, TextSet
from text2loc_tpu.models.cell_retrieval import CellRetrievalNetwork
from text2loc_tpu.models.language_encoder import LanguageEncoder


def test_language_encoder_ignores_padded_tokens():
    rng = np.random.default_rng(0)
    b, s, t, e = 2, 3, 6, 16
    emb = rng.standard_normal((b, s, t, e)).astype(np.float32)
    token_mask = np.zeros((b, s, t), bool)
    token_mask[:, :, :4] = True
    sent_mask = np.ones((b, s), bool)

    le = LanguageEncoder(embed_dim=8, is_fine=True, mask_padded=True)
    variables = jax.jit(lambda r, ts: le.init(r, ts, train=False))(
        jax.random.PRNGKey(0),
        TextSet(jnp.asarray(emb), jnp.asarray(token_mask), jnp.asarray(sent_mask)),
    )

    def run(token_embeds):
        return np.asarray(le.apply(
            variables,
            TextSet(jnp.asarray(token_embeds), jnp.asarray(token_mask),
                    jnp.asarray(sent_mask)),
            train=False,
        ))

    base = run(emb)
    # Garbage in the masked token slots must not change the output.
    noisy = emb.copy()
    noisy[:, :, 4:] = 1e3
    np.testing.assert_allclose(run(noisy), base, rtol=1e-4, atol=1e-5)


def test_cell_tower_ignores_padded_objects(small_cfg, small_embedder, small_data):
    cfg = small_cfg
    model = CellRetrievalNetwork(cfg.model)
    batch = small_data.gather_cell_objects(np.arange(4), cfg.model.object_size)
    from text2loc_tpu.data.augment import point_cloud_transform

    xyz, rgb = point_cloud_transform(
        jnp.asarray(batch["xyz"]), jnp.asarray(batch["rgb"]),
        jax.random.PRNGKey(0), num_points=cfg.model.pointnet.num_points,
        augment=False,
    )

    def build(center):
        return ObjectSet(
            xyz=xyz, rgb=rgb, center=jnp.asarray(center),
            color=jnp.asarray(batch["color"]),
            num_points=jnp.asarray(batch["num_points"]),
            class_idx=jnp.asarray(batch["class_idx"]),
            color_idx=jnp.asarray(batch["color_idx"]),
            mask=jnp.asarray(batch["mask"]),
        )

    objects = build(batch["center"])
    variables = jax.jit(
        lambda r, o: model.init(r, o, train=False, method=model.encode_objects)
    )(jax.random.PRNGKey(0), objects)

    def run(objs):
        return np.asarray(model.apply(
            variables, objs, train=False, method=model.encode_objects
        ))

    base = run(objects)
    # Perturb the padded objects' centers: embeddings must be unchanged.
    center2 = np.asarray(batch["center"]).copy()
    center2[~batch["mask"]] += 7.0
    np.testing.assert_allclose(run(build(center2)), base, rtol=1e-4, atol=1e-5)
