import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: slow tests")


@pytest.fixture
def rng():
    return np.random.default_rng(0)
