import pytest
import ray
from hypothesis import settings

# deterministic property tests: the driver's verify must never fail on a
# freshly-drawn example that local runs never saw
settings.register_profile("ci", derandomize=True, deadline=None)
settings.load_profile("ci")


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(address="local", num_cpus=4, include_dashboard=False, ignore_reinit_error=True)
    yield
    ray.shutdown()
