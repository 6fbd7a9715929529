import jax
def test_platform():
    print("DEVICES:", jax.devices())
    assert jax.devices()[0].platform == "cpu"
    assert len(jax.devices()) == 8
