"""Package setup for hyperbo_tpu."""

from setuptools import find_packages, setup

setup(
    name='hyperbo_tpu',
    version='0.1.0',
    description=('TPU-native pre-trained Gaussian processes for Bayesian '
                 'optimization (HyperBO capabilities, built on '
                 'JAX/XLA/Pallas/pjit).'),
    packages=find_packages(exclude=('tests',)),
    python_requires='>=3.10',
    install_requires=[
        'jax',
        'flax',
        'optax',
        'numpy',
        'pandas',
        'scipy',
        'matplotlib',
    ],
    extras_require={
        'test': ['pytest'],
        'checkpoint': ['orbax-checkpoint'],
    },
    entry_points={
        'console_scripts': [
            'hyperbo-tpu-exp=hyperbo_tpu.experiments.driver:main',
        ],
    },
)
