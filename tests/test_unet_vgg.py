import numpy as np
import jax
import jax.numpy as jnp

from unseenobjectswithmeanshift_tpu.models.unet import UNetEmbedding, VGGEmbedding
from unseenobjectswithmeanshift_tpu.models.segnet import SEGNET


def test_unet_embedding_shapes(rng):
    m = UNetEmbedding(feature_dim=16)
    x = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert out.shape == (1, 32, 32, 16)


def test_vgg_embedding_shapes(rng):
    m = VGGEmbedding(num_units=16)
    x = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    # 5 maxpools down, 5 transpose-conv ups -> full input resolution
    assert out.shape == (1, 32, 32, 16)


def test_segnet_unet_variant(rng):
    m = SEGNET(network="unet", input_type="COLOR", num_units=16)
    x = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=-1), 1.0,
                               atol=1e-5)
