"""deploy/stack.yaml — the docker-compose/stack analogue — must stay
consistent with the repo: every service command is a real entry point and
every env key a real ZKLC_* flag (docker-compose.yml:1-95 role parity)."""
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.smoke

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "scripts"))


def test_manifest_validates():
    import stack_up
    doc = stack_up.load_manifest()
    assert stack_up.validate(doc) == []
    # the reference's five roles are all present
    assert set(doc["services"]) == {"broker", "http_service",
                                    "block_prover", "sign_prover",
                                    "gnark_wrapper"}
    # TPU-placed services are marked so stack_up skips them by default
    assert doc["services"]["block_prover"]["placement"]["accelerator"] == \
        "tpu"
    assert doc["services"]["sign_prover"]["replicas"] == 2


def test_stack_up_check_cli():
    r = subprocess.run([sys.executable, "scripts/stack_up.py", "--check"],
                       capture_output=True, text=True, cwd=ROOT, timeout=60)
    assert r.returncode == 0, r.stderr
    assert "manifest ok" in r.stdout
