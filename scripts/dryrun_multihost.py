#!/usr/bin/env python3
"""Process-spanning DP dryrun: 2 OS processes x 4 virtual CPU devices run
the tiny flagship-shaped train step over ONE global 8-device mesh via
`jax.distributed`, and the step-1 loss must match the single-process
8-device mesh run (the simulation `__graft_entry__.dryrun_multichip` uses).

This backs the "pod-scale all-gather contrastive batch" claim
(BASELINE.json config #5, SURVEY §5 distributed-backend bullet) with an
actual multi-process test: the coordination service, cross-process mesh,
`make_array_from_process_local_data` batch assembly, and the DCN-shaped
collective path all execute for real.

Modes:
  (no args)      orchestrator: runs the single-process reference loss, then
                 spawns 2 workers and compares. Exit 0 iff losses match.
  --worker I     worker process I of N (spawned by the orchestrator).
  --single       print the single-process 8-device loss and exit.
"""
import argparse
import json
import os
import socket
import subprocess
import sys

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, REPO)

N_PROCESSES = 2
DEVICES_PER_PROC = 4


def _worker_env(pid: int, port: int, nproc: int, dev_per_proc: int) -> dict:
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        XLA_FLAGS=f"--xla_force_host_platform_device_count={dev_per_proc}",
        SPEECHCLIP_COORDINATOR=f"127.0.0.1:{port}",
        SPEECHCLIP_NUM_PROCESSES=str(nproc),
        SPEECHCLIP_PROCESS_ID=str(pid),
        SPEECHCLIP_NO_COMPILE_CACHE="1",
    )
    return env


def _step_loss() -> float:
    """Build the tiny flagship config and run ONE DP train step over the
    global mesh; each process contributes its local batch rows."""
    import jax

    from speechclip_plus_tpu.parallel import (
        create_train_state,
        make_global_batch,
        make_mesh,
        make_train_step,
    )
    from speechclip_plus_tpu.optim import build_optimizer
    import __graft_entry__ as ge
    import numpy as np

    n_global = N_PROCESSES * DEVICES_PER_PROC
    assert len(jax.devices()) == n_global, (
        len(jax.devices()), n_global)

    # identical model/batch construction in every process (same seeds)
    from speechclip_plus_tpu.models import KWClip

    cfg = ge._dryrun_cfg()
    model = KWClip(cfg)
    rng = np.random.RandomState(0)
    batch = ge._make_batch(
        rng, B=2 * n_global, T=640, img=cfg.clip.image_resolution,
        ctx=cfg.clip.context_length, sot=cfg.clip.sot_id,
        eot=cfg.clip.eot_id,
    )
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch,
                           training=False)
    tx = build_optimizer(
        variables["params"], cfg,
        scheduler_args={"warmup": 10, "max_step": 100, "final_lr": 1e-8},
    )
    mesh = make_mesh(jax.devices())
    state = create_train_state(model, variables, tx)
    step = make_train_step(model, tx, mesh=mesh, donate=False)

    nproc = jax.process_count()
    if nproc > 1:
        # local rows for this process: the mesh lays processes out in
        # device order, so process i owns the i-th contiguous row block
        per = (2 * n_global) // nproc
        pid = jax.process_index()
        local = {k: np.asarray(v)[pid * per:(pid + 1) * per]
                 for k, v in batch.items()}
        sharded = make_global_batch(local, mesh)
    else:
        sharded = make_global_batch(batch, mesh)

    _, metrics = step(state, sharded, jax.random.PRNGKey(1))
    return float(metrics["train_loss"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", type=int, default=None)
    ap.add_argument("--single", action="store_true")
    args = ap.parse_args()

    if args.single:
        import jax

        jax.config.update("jax_platforms", "cpu")
        print(json.dumps({"loss": _step_loss()}))
        return

    if args.worker is not None:
        # the ambient axon TPU plugin clobbers JAX_PLATFORMS during
        # `import jax`; re-force CPU through the config API before the
        # backend (and the coordination service) initializes
        import jax

        jax.config.update("jax_platforms", "cpu")
        from speechclip_plus_tpu.parallel import maybe_initialize_distributed

        assert maybe_initialize_distributed(), "worker env not set"
        loss = _step_loss()
        print(json.dumps({"pid": args.worker, "loss": loss}), flush=True)
        return

    # ---- orchestrator ----------------------------------------------------
    me = os.path.abspath(__file__)

    def run(cmd, env):
        out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                             timeout=900)
        if out.returncode != 0:
            sys.stderr.write(out.stdout + out.stderr)
            raise SystemExit(f"subprocess failed: {cmd}")
        return json.loads(out.stdout.strip().splitlines()[-1])

    env1 = dict(os.environ)
    env1.update(
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count="
                  f"{N_PROCESSES * DEVICES_PER_PROC}",
        SPEECHCLIP_NO_COMPILE_CACHE="1",
    )
    env1.pop("SPEECHCLIP_COORDINATOR", None)
    single = run([sys.executable, me, "--single"], env1)

    with socket.socket() as s:  # free port for the coordinator
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    procs = [
        subprocess.Popen(
            [sys.executable, me, "--worker", str(i)],
            env=_worker_env(i, port, N_PROCESSES, DEVICES_PER_PROC),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(N_PROCESSES)
    ]
    results = []
    for p in procs:
        out, err = p.communicate(timeout=900)
        if p.returncode != 0:
            sys.stderr.write(out + err)
            raise SystemExit("worker failed")
        results.append(json.loads(out.strip().splitlines()[-1]))

    losses = [r["loss"] for r in results]
    ok = all(abs(l - single["loss"]) < 1e-5 + 1e-5 * abs(single["loss"])
             for l in losses)
    print(json.dumps({
        "single_process_loss": single["loss"],
        "multi_process_losses": losses,
        "processes": N_PROCESSES,
        "devices_per_process": DEVICES_PER_PROC,
        "ok": ok,
    }))
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
