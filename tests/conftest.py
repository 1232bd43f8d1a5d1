import os
import sys

# Run all tests on a virtual 8-device CPU mesh so multi-chip sharding logic is
# exercised without TPU hardware (see SURVEY.md §4).
#
# Hard override: when the axon tunnel is ALIVE, /root/.axon_site's
# sitecustomize has already registered the remote-TPU PJRT plugin at
# interpreter start (keyed on PALLAS_AXON_POOL_IPS), and once registered
# neither JAX_PLATFORMS=cpu nor clearing the var undoes it —
# jax.devices() returns the single remote chip and every compile
# round-trips through the tunnel (verified: override yields [TPU v5
# lite0]).  The only way out is re-exec'ing pytest with a clean env
# (same trick as bench.py's CPU fallback, in reverse).  That happens in
# pytest_configure below, where pytest's fd capture can be stopped
# first — exec'ing while capture is active sends the whole child run's
# output into the capture temp file, which dies with the parent.
#
# Known limitation: the re-exec rebuilds the command as `python -m pytest
# <args>`, so plugin objects passed programmatically via
# pytest.main(plugins=...) and other non-CLI invocation state are dropped.
# CLI invocations (the only supported entry point here) are unaffected.

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_configure(config):
    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.stop_global_capturing()
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    os.environ["JAX_PLATFORMS"] = "cpu"
    sys.stdout.flush()
    sys.stderr.flush()
    os.execv(sys.executable, [sys.executable, "-m", "pytest"]
             + list(config.invocation_params.args))
