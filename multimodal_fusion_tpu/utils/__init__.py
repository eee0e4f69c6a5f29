from multimodal_fusion_tpu.utils.seeding import seed_everything, rng_seq  # noqa: F401
