"""Single-host bring-up of deploy/stack.yaml — the `docker compose up`
analogue for environments without a container runtime.

  python scripts/stack_up.py --check          # validate the manifest only
  python scripts/stack_up.py broker http_service   # run selected services
  python scripts/stack_up.py                  # run every local-safe service

Services marked `placement: {accelerator: tpu}` are skipped unless
--include-tpu is passed (they contend for the single tunneled chip).
Processes run in the foreground process group; Ctrl-C tears the stack
down.  Volume/replica/resource fields are deployment metadata for real
supervisors and are ignored here beyond validation.
"""
from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import time

import yaml

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MANIFEST = os.path.join(ROOT, "deploy", "stack.yaml")


def load_manifest(path: str = MANIFEST) -> dict:
    with open(path) as f:
        doc = yaml.safe_load(f)
    if "services" not in doc:
        raise ValueError("manifest has no services block")
    return doc


def validate(doc: dict) -> list:
    """Every command must reference a real entry point in this repo."""
    problems = []
    for name, svc in doc["services"].items():
        cmd = svc.get("command")
        if not cmd:
            problems.append(f"{name}: no command")
            continue
        if cmd[0] == "python" and cmd[1] == "-m":
            mod = cmd[2].replace(".", "/") + ".py"
            if not os.path.exists(os.path.join(ROOT, mod)):
                problems.append(f"{name}: module {cmd[2]} not found")
        elif cmd[0] in ("python", "bash"):
            if not os.path.exists(os.path.join(ROOT, cmd[1])):
                problems.append(f"{name}: script {cmd[1]} not found")
        for k in svc.get("env", {}):
            if not k.startswith("ZKLC_"):
                problems.append(f"{name}: unknown env key {k}")
    return problems


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("services", nargs="*")
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--include-tpu", action="store_true")
    args = ap.parse_args(argv)

    doc = load_manifest()
    problems = validate(doc)
    if problems:
        for pr in problems:
            print("MANIFEST ERROR:", pr, file=sys.stderr)
        return 1
    if args.check:
        print(f"manifest ok: {len(doc['services'])} services")
        return 0

    selected = args.services or list(doc["services"])
    procs = {}
    try:
        for name in selected:
            svc = doc["services"][name]
            if (svc.get("placement", {}).get("accelerator") == "tpu"
                    and not args.include_tpu):
                print(f"skip {name} (tpu placement; --include-tpu to run)")
                continue
            env = dict(os.environ)
            env.update({k: str(v) for k, v in svc.get("env", {}).items()})
            procs[name] = subprocess.Popen(svc["command"], cwd=ROOT, env=env)
            print(f"started {name} pid={procs[name].pid}")
        while procs:
            time.sleep(2)
            for name, p in list(procs.items()):
                if p.poll() is not None:
                    print(f"{name} exited rc={p.returncode}")
                    del procs[name]
    except KeyboardInterrupt:
        pass
    finally:
        for name, p in procs.items():
            print(f"stopping {name}")
            p.send_signal(signal.SIGTERM)
        for p in procs.values():
            try:
                p.wait(timeout=10)
            except subprocess.TimeoutExpired:
                p.kill()
    return 0


if __name__ == "__main__":
    sys.exit(main())
