from setuptools import find_packages, setup

setup(
    name="matcha-tts-tpu",
    version="0.1.0",
    description="TPU-native conditional-flow-matching TTS framework (JAX/XLA/Pallas)",
    packages=find_packages(include=["matcha_tts_tpu*"]),
    python_requires=">=3.10",
    install_requires=["jax", "numpy", "optax", "orbax-checkpoint"],
)
