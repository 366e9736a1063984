"""Crash-resilient checkpointed FEAST driving (framework feature).

The remote-TPU worker can die under sustained large-problem dispatch
("TPU worker process crashed" — reproducibly after ~2 consecutive 1M-dof
sweeps on this image's axon backend), and a dead backend poisons every
subsequent dispatch in the SAME process.  Recovery therefore needs process
isolation: `feast_iterative_checkpointed` runs ONE refinement sweep per
subprocess (the `keep_q`/`nit0` exact-stepping contract of
solvers.ifeast.feast_iterative), checkpoints the moment subspace Q after
every sweep (atomic tmp+rename), and restarts crashed or hung workers from
the last checkpoint.  This promotes the benchmarks/sparse1m.py orchestrator
into the library (VERDICT r2 prescription #4).

The reference has no counterpart (SURVEY.md section 5: "Checkpoint/resume:
none"); its restart story is only the in/out X convention (feast.jl:3).

Layout of `checkpoint_dir`:
  problem.npz    A, B (scipy CSR blobs or dense), X0  [unless `builder`]
  config.json    solver kwargs + sweep bookkeeping
  state.npz      latest checkpoint: Q, lam, res, inside, sweeps, converged
  log.jsonl      one line per sweep / restart event

A worker is `python -m feast_tpu.orchestrate <checkpoint_dir>`.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from typing import Optional

import numpy as np

_PROBLEM = "problem.npz"
_CONFIG = "config.json"
_STATE = "state.npz"
_LOG = "log.jsonl"

# feast_iterative kwargs a checkpointed run may carry (everything must be
# JSON- or npz-serializable; mesh/callables/contour objects are not).
_ALLOWED = {"r", "nodes", "tol", "tol_mode", "solver", "solve_tol",
            "solve_iters", "precondition", "spurious", "ortho",
            "node_chunk", "rr", "reorder", "debug"}


def _log(cdir, rec):
    rec = dict(rec, t=round(time.time(), 1))
    with open(os.path.join(cdir, _LOG), "a") as f:
        f.write(json.dumps(rec) + "\n")


def _save_problem(cdir, A, B, X0):
    import scipy.sparse as sp

    payload = {}

    def pack(tag, M):
        if M is None:
            payload[f"{tag}_kind"] = "none"
        elif sp.issparse(M):
            M = sp.csr_matrix(M)
            payload[f"{tag}_kind"] = "csr"
            payload[f"{tag}_data"] = M.data
            payload[f"{tag}_indices"] = M.indices
            payload[f"{tag}_indptr"] = M.indptr
            payload[f"{tag}_shape"] = np.asarray(M.shape)
        else:
            payload[f"{tag}_kind"] = "dense"
            payload[f"{tag}_data"] = np.asarray(M)

    pack("A", A)
    pack("B", B)
    payload["X0"] = np.asarray(X0)
    np.savez(os.path.join(cdir, _PROBLEM), **payload)


def _load_problem(cdir):
    import scipy.sparse as sp

    with np.load(os.path.join(cdir, _PROBLEM), allow_pickle=False) as f:
        def unpack(tag):
            kind = str(f[f"{tag}_kind"])
            if kind == "none":
                return None
            if kind == "csr":
                return sp.csr_matrix(
                    (f[f"{tag}_data"], f[f"{tag}_indices"],
                     f[f"{tag}_indptr"]),
                    shape=tuple(f[f"{tag}_shape"]))
            return f[f"{tag}_data"]

        return unpack("A"), unpack("B"), f["X0"]


def _atomic_savez(path, **payload):
    tmp = path + ".tmp.npz"
    np.savez(tmp, **payload)
    os.replace(tmp, path)


def _pull_warm_f32(warm):
    """Checkpoint the per-node Krylov warm blocks as PER-NODE complex64
    pulls.  One monolithic f64 device->host transfer of the whole
    (nodes, n, m0) stack is itself a measured remote-worker crash trigger
    (r2: the axon worker died twice mid-pull at 128 MB; r5: a 100k sweep
    COMPLETED on device and the worker died inside cx.to_numpy(warm)).
    Warm blocks are only Krylov initial guesses — f32 halves the transfer
    and costs at most one extra outer iteration; per-node slicing keeps
    each pull at 2*n*m0*4 bytes (~8 MB at 100k dof)."""
    import jax.numpy as jnp

    nodes = warm.re.shape[0]
    out = np.empty(warm.re.shape, dtype=np.complex64)
    for i in range(nodes):
        re = np.asarray(warm.re[i].astype(jnp.float32))
        im = np.asarray(warm.im[i].astype(jnp.float32))
        out[i] = re + 1j * im
    return out


def feast_iterative_checkpointed(
        A=None, B=None, X0=None, *,
        checkpoint_dir: str,
        c: complex = 0.0 + 0.0j,
        max_sweeps: int = 20,
        max_restarts: int = 10,
        worker_timeout: float = 3600.0,
        resume: bool = True,
        builder: Optional[str] = None,
        builder_kwargs: Optional[dict] = None,
        amg_f32: bool = False,
        amg_damp: float = 0.0,
        sweeps_per_worker: int = 1,
        warm_starts: bool = True,
        chunk_checkpoints: bool = True,
        platform: Optional[str] = None,
        worker_env: Optional[dict] = None,
        verbose: bool = True,
        **feast_kwargs):
    """Run feast_iterative to convergence, one refinement sweep per
    SUBPROCESS, restarting crashed/hung workers from the last checkpoint.

    Problem delivery: either pass (A, B, X0) directly — they are serialized
    once into `checkpoint_dir/problem.npz` (scipy CSR or dense) — or pass
    `builder="pkg.module:function"` (+ builder_kwargs) and each worker
    rebuilds (A, B[, X0]) in-process (for problems too big or too custom to
    serialize; the function must return (A, B) or (A, B, X0)).

    amg_f32: shorthand for amg_opts={"dtype": float32} (jnp dtypes are not
    JSON-serializable).  platform: force the worker backend (e.g. "cpu" for
    tests).  Other kwargs go to feast_iterative verbatim (JSON-serializable
    subset only: no mesh, no callable preconditioner, no Contour objects).

    warm_starts (default True): checkpoint the per-node Krylov solutions
    alongside Q so each fresh worker reseeds its node solves from the
    previous sweep instead of solving from zero (VERDICT r4 weak #4: one
    cold sweep was 1489 s of the 2414 s total at 100k dof).  Stored
    complex64 and pulled per node (see _pull_warm_f32); set False to keep
    checkpoints minimal.

    chunk_checkpoints (default True, effective only when node_chunk is
    set): SUB-sweep checkpointing — after every node chunk the worker
    persists the partial moment accumulator + that chunk's warm block to
    partial.npz, and a restarted worker resumes its sweep mid-chunk-loop
    instead of from the sweep start.  This exists because a remote
    worker's lifetime can be SHORTER than one sweep (measured r5: the
    axon backend killed processes every 3-6 min while a 100k sweep plus
    worker startup needed ~4 — no full-sweep attempt could ever land).

    Returns a solvers.feast.FeastResult (host-materialized).  The run is
    resumable: re-calling with resume=True (default) continues from
    `checkpoint_dir/state.npz`."""
    from . import cx
    from .solvers.feast import FeastResult

    bad = set(feast_kwargs) - _ALLOWED
    if bad:
        raise ValueError(
            f"feast_iterative_checkpointed cannot serialize kwargs {bad}; "
            f"allowed: {sorted(_ALLOWED)}")
    os.makedirs(checkpoint_dir, exist_ok=True)
    state_path = os.path.join(checkpoint_dir, _STATE)
    if not resume and os.path.exists(state_path):
        os.remove(state_path)

    if builder is None:
        if A is None or X0 is None:
            raise ValueError("pass (A, B, X0) or builder=")
        _save_problem(checkpoint_dir, A, B, X0)
    elif X0 is not None:
        np.savez(os.path.join(checkpoint_dir, "x0.npz"), X0=np.asarray(X0))

    config = {"c": [complex(c).real, complex(c).imag],
              "builder": builder, "builder_kwargs": builder_kwargs or {},
              "amg_f32": bool(amg_f32), "amg_damp": float(amg_damp),
              "sweeps_per_worker": int(sweeps_per_worker),
              "warm_starts": bool(warm_starts),
              "chunk_checkpoints": bool(chunk_checkpoints),
              "platform": platform,
              "kwargs": feast_kwargs}
    with open(os.path.join(checkpoint_dir, _CONFIG), "w") as f:
        json.dump(config, f, indent=1)

    # Workers must import feast_tpu from the same place as the parent —
    # but NOT via PYTHONPATH: a set PYTHONPATH (any value, even an empty
    # directory) deterministically breaks the remote TPU plugin's
    # registration in this environment ("Unable to initialize backend
    # 'axon'"), measured r5 after a day of mystery worker crashes.  The
    # import paths ride inside a `python -c` preamble instead, and
    # PYTHONPATH is stripped from the worker env.
    pkg_parent = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    inherited = env.pop("PYTHONPATH", "")
    worker_paths = [pkg_parent] + [p for p in inherited.split(os.pathsep)
                                   if p]
    if worker_env:
        env.update({k: str(v) for k, v in worker_env.items()})

    t0 = time.perf_counter()
    _log(checkpoint_dir, {"event": "run_start"})
    restarts = 0
    last_failure = None  # (rc, tail) of the previous no-progress failure
    sweeps = _read_sweeps(state_path)
    converged = sweeps_converged(state_path)
    while not converged and sweeps < max_sweeps:
        preamble = (f"import sys; sys.path[:0] = {worker_paths!r}; "
                    "from feast_tpu.orchestrate import _worker; "
                    f"sys.exit(_worker({os.path.abspath(checkpoint_dir)!r}))")
        cmd = [sys.executable, "-c", preamble]
        # Worker output ALWAYS lands in worker.log (overwritten per attempt)
        # so a crash leaves its stderr on disk — 11 blind rc=1 retries in r3
        # burned 40 min of chip time with zero recorded diagnosis.
        worker_log = os.path.join(checkpoint_dir, "worker.log")
        try:
            with open(worker_log, "w") as lf:
                p = subprocess.run(cmd, env=env, timeout=worker_timeout,
                                   stdout=lf, stderr=subprocess.STDOUT)
            rc = p.returncode
        except subprocess.TimeoutExpired:
            rc = "timeout"
        new_sweeps = _read_sweeps(state_path)
        if rc != 0 and new_sweeps == sweeps:
            restarts += 1
            tail = _tail_lines(worker_log, 20)
            _log(checkpoint_dir, {"event": "worker_restart", "rc": str(rc),
                                  "restarts": restarts,
                                  "stderr_tail": tail})
            if verbose:
                print(f"[orchestrate] worker died (rc={rc}); restart "
                      f"{restarts}/{max_restarts} from sweep {sweeps}\n"
                      + "\n".join("  | " + t for t in tail[-5:]),
                      flush=True)
            # deterministic-failure early abort: the same rc with the same
            # last error line and zero progress twice in a row is a
            # repeating failure (compile OOM, import error, bad config) —
            # retrying max_restarts times cannot help.  KNOWN-TRANSIENT
            # infrastructure failures are exempt: the remote TPU worker
            # dying ("UNAVAILABLE: TPU worker process crashed") is the
            # exact flakiness this orchestrator exists to absorb, and two
            # in a row on a long cold sweep is common (measured r5: two
            # identical axon crashes 8 min apart aborted a healthy 100k
            # run) — those retry up to max_restarts like any other crash.
            sig = (str(rc), tail[-1] if tail else "")
            # known-transient remote-backend failure modes (measured r5):
            # the worker process dying mid-dispatch, and the plugin
            # failing to REGISTER during an endpoint outage window
            transient = any(t in sig[1] for t in (
                "TPU worker process crashed",
                "Unable to initialize backend"))
            if last_failure == sig and not transient:
                raise RuntimeError(
                    f"worker failed twice identically without progress "
                    f"(rc={rc}, last line: {sig[1]!r}); aborting early — "
                    f"see {worker_log}")
            last_failure = sig
            if transient:
                # give the flapping endpoint a recovery window instead of
                # hammering it with immediate re-registration attempts
                time.sleep(min(10.0 * restarts, 60.0))
            if restarts > max_restarts:
                raise RuntimeError(
                    f"worker failed {restarts} times without progress "
                    f"(last rc={rc}); see {checkpoint_dir}/{_LOG}")
            continue
        if rc == 0 and new_sweeps == sweeps \
                and not sweeps_converged(state_path):
            # a clean exit with neither progress nor convergence would loop
            # forever (n_sweeps contract: a non-converged call always
            # executes >= 1 sweep — this firing means that contract broke)
            raise RuntimeError(
                "worker exited cleanly with neither progress nor "
                f"convergence at sweep {sweeps}; see {worker_log}")
        last_failure = None
        sweeps = new_sweeps
        converged = sweeps_converged(state_path)
        if verbose:
            print(f"[orchestrate] sweep {sweeps} checkpointed, "
                  f"converged={converged}", flush=True)

    if not os.path.exists(state_path):
        raise RuntimeError("no checkpoint was ever written")
    with np.load(state_path, allow_pickle=False) as st:
        lam = cx.from_numpy(st["lam"])
        X = cx.from_numpy(st["X"])
        res = st["res"]
        inside = st["inside"].astype(bool)
        Q = cx.from_numpy(st["Q"])
        conv = bool(st["converged"])
        n_sweeps = int(st["sweeps"])
    _log(checkpoint_dir, {"event": "done", "converged": conv,
                          "sweeps": n_sweeps, "restarts": restarts,
                          "wall_s": round(time.perf_counter() - t0, 2)})
    return FeastResult(lam, X, res, inside, n_sweeps, conv, Q)


def _tail_lines(path, k=20):
    """Last k non-empty lines of a worker log (for forensics events)."""
    try:
        with open(path, "r", errors="replace") as f:
            lines = [ln.rstrip() for ln in f.readlines() if ln.strip()]
        return lines[-k:]
    except OSError:
        return []


def read_restarts(checkpoint_dir) -> int:
    """worker_restart events since the most recent run_start log event."""
    n = 0
    try:
        with open(os.path.join(checkpoint_dir, _LOG)) as f:
            for ln in f:
                try:
                    ev = json.loads(ln).get("event")
                except json.JSONDecodeError:
                    continue
                if ev == "run_start":
                    n = 0
                elif ev == "worker_restart":
                    n += 1
    except OSError:
        pass
    return n


def _read_sweeps(state_path) -> int:
    if not os.path.exists(state_path):
        return 0
    try:
        with np.load(state_path, allow_pickle=False) as st:
            return int(st["sweeps"])
    except Exception:
        return 0


def sweeps_converged(state_path) -> bool:
    if not os.path.exists(state_path):
        return False
    try:
        with np.load(state_path, allow_pickle=False) as st:
            return bool(st["converged"])
    except Exception:
        return False


def _worker(cdir: str) -> int:
    """One refinement sweep: load config + problem + latest Q, run
    feast_iterative(iters=0, keep_q=True, nit0=<sweeps so far>), atomically
    checkpoint the new state."""
    with open(os.path.join(cdir, _CONFIG)) as f:
        config = json.load(f)

    import jax

    if config.get("platform"):
        jax.config.update("jax_platforms", config["platform"])
    jax.config.update("jax_enable_x64", True)
    cache = os.path.join(cdir, os.pardir, ".jax_cache")
    repo_cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir",
                          repo_cache if os.path.isdir(repo_cache) else cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
    import jax.numpy as jnp

    from . import cx
    from .solvers.ifeast import feast_iterative

    if config["builder"]:
        import importlib

        mod_name, fn_name = config["builder"].split(":")
        fn = getattr(importlib.import_module(mod_name), fn_name)
        built = fn(**config["builder_kwargs"])
        if len(built) == 3:
            A, B, X0 = built
        else:
            A, B = built
            X0 = None
        x0p = os.path.join(cdir, "x0.npz")
        if X0 is None:
            if not os.path.exists(x0p):
                raise ValueError("builder returned no X0 and no x0.npz")
            X0 = np.load(x0p)["X0"]
    else:
        A, B, X0 = _load_problem(cdir)

    state_path = os.path.join(cdir, _STATE)
    sweeps = _read_sweeps(state_path)
    warm0 = None
    use_warm = bool(config.get("warm_starts", True))
    if sweeps:
        with np.load(state_path, allow_pickle=False) as st:
            X0 = st["Q"]
            if use_warm and "warm" in st.files:
                # stored complex64 (see _pull_warm_f32); feast_iterative
                # casts to the compute dtype on entry
                warm0 = st["warm"]

    kwargs = dict(config["kwargs"])
    # >1 keeps feast_iterative's per-node Krylov warm starts AND the
    # in-process jit cache alive across that many refinement sweeps
    # (warm blocks cannot be checkpointed cheaply: 8 nodes x (n, m0) f64
    # CX ~ 256 MB at 100k dof).  Measured r4: the 3rd isolated one-sweep
    # worker paid 1489 s vs 173 s for sweep 2 - cold Krylov starts
    # dominate late sweeps.  The block runs as spw SINGLE-sweep calls
    # with a checkpoint after EACH: one fused iters=spw-1 call only
    # checkpointed at block end, so a mid-block transient worker crash
    # erased every completed sweep (measured r5: two axon crashes during
    # sweep blocks = "zero progress twice" = spurious abort).
    spw = max(int(config.get("sweeps_per_worker", 1)), 1)
    amg_opts = {"dtype": jnp.float32} if config["amg_f32"] else {}
    if config.get("amg_damp"):
        amg_opts["damp"] = float(config["amg_damp"])
    amg_opts = amg_opts or None
    cc = complex(config["c"][0], config["c"][1])

    # Sub-sweep (per-node-chunk) checkpointing: persist the partial moment
    # accumulator after every chunk so a worker that dies MID-sweep leaves
    # resumable progress (see feast_iterative_checkpointed docstring).
    partial_path = os.path.join(cdir, "partial.npz")
    use_chunk_ckpt = (bool(config.get("chunk_checkpoints", True))
                      and kwargs.get("node_chunk"))
    resume_chunk = None
    if use_chunk_ckpt and os.path.exists(partial_path):
        try:
            with np.load(partial_path, allow_pickle=False) as pt:
                if int(pt["for_sweep"]) == sweeps + 1:
                    ci_done = int(pt["ci_done"])
                    resume_chunk = {"ci0": ci_done + 1}
                    if ci_done >= 0:
                        resume_chunk["Qn"] = pt["Qn"]
                        resume_chunk["warm_new"] = [
                            pt[f"warm_new_{i}"] for i in range(ci_done + 1)]
                    if "rr_X" in pt.files:
                        resume_chunk["rr"] = (pt["rr_X"], pt["rr_lam"],
                                              pt["rr_R"], pt["rr_res"],
                                              pt["rr_inside"])
        except Exception:
            resume_chunk = None  # unreadable/stale: redo from the sweep top

    # payload accumulated across this sweep's callbacks (the RR prelude
    # blobs must survive into every later per-chunk save)
    _partial = {}
    if resume_chunk is not None:
        _partial["for_sweep"] = np.asarray(sweeps + 1)
        _partial["ci_done"] = np.asarray(resume_chunk["ci0"] - 1)
        if "rr" in resume_chunk:
            for k, v in zip(("rr_X", "rr_lam", "rr_R", "rr_res",
                             "rr_inside"), resume_chunk["rr"]):
                _partial[k] = np.asarray(v)
        for i, w in enumerate(resume_chunk.get("warm_new", [])):
            _partial[f"warm_new_{i}"] = np.asarray(w, dtype=np.complex64)
        if "Qn" in resume_chunk:
            _partial["Qn"] = np.asarray(resume_chunk["Qn"])

    def _chunk_ckpt(info):
        from . import cx as cxm
        if info["ci"] == -1:
            # RR prelude: fresh sweep — reset the payload
            Xh, lamh, Rh, res_h, inside_h = info["rr"]
            _partial.clear()
            _partial.update(
                for_sweep=np.asarray(sweeps + 1), ci_done=np.asarray(-1),
                rr_X=cxm.to_numpy(Xh), rr_lam=cxm.to_numpy(lamh),
                rr_R=cxm.to_numpy(Rh), rr_res=np.asarray(res_h),
                rr_inside=np.asarray(inside_h))
        else:
            _partial["ci_done"] = np.asarray(info["ci"])
            _partial["Qn"] = cxm.to_numpy(info["Qn"])
            _partial[f"warm_new_{info['ci']}"] = \
                _pull_warm_f32(info["warm_chunk"])
        _atomic_savez(partial_path, **_partial)
        # crash-injection hook for the sub-sweep recovery tests: die right
        # after persisting chunk `idx`'s partial ("marker_path:idx";
        # one-shot via the marker file)
        spec = os.environ.get("FEAST_ORCH_CRASH_AFTER_CHUNK")
        if spec:
            marker, idx = spec.rsplit(":", 1)
            if info["ci"] == int(idx) and not os.path.exists(marker):
                with open(marker, "w") as f:
                    f.write("crashed\n")
                os._exit(17)

    for _ in range(spw):
        t0 = time.perf_counter()
        resumed_ci = (resume_chunk["ci0"] if resume_chunk is not None
                      else None)
        out = feast_iterative(A, B, X0, c=cc, iters=0, keep_q=True,
                              nit0=sweeps, amg_opts=amg_opts,
                              warm0=warm0, keep_warm=use_warm,
                              chunk_ckpt=_chunk_ckpt if use_chunk_ckpt
                              else None,
                              resume_chunk=resume_chunk, **kwargs)
        resume_chunk = None  # applies to the first sweep only
        _partial.clear()
        sweep_s = time.perf_counter() - t0
        # node-solve sweeps actually executed, counted by the driver
        # itself (ADVICE r4: reconstructing it from (n_iter, converged)
        # miscounted both the fused-step path, which sweeps before its
        # convergence check, and a converged-at-entry chunked call,
        # which sweeps zero)
        done_in_call = int(out.n_sweeps)

        # crash-injection hook for the recovery tests: die AFTER the
        # sweep's compute but BEFORE the checkpoint (simulates the real
        # mid-sweep worker loss; the marker file makes it one-shot)
        crash_marker = os.environ.get("FEAST_ORCH_CRASH_ONCE")
        if crash_marker and not os.path.exists(crash_marker):
            with open(crash_marker, "w") as f:
                f.write("crashed\n")
            os._exit(17)

        # Q is the exact-continuation subspace either way: on convergence
        # the driver breaks before the node sweep and returns the INPUT Q
        # unchanged
        Qh = cx.to_numpy(out.Q if out.Q is not None else out.X)
        extra = {}
        if use_warm:
            if out.warm is not None and done_in_call > 0:
                extra["warm"] = _pull_warm_f32(out.warm)
            elif warm0 is not None:
                # converged-at-entry calls (done_in_call == 0) re-save the
                # previous sweep's warm blocks (atomic_savez replaces the
                # whole state file) rather than drop them for the buffers
                # of a sweep that never ran
                extra["warm"] = np.asarray(warm0, dtype=np.complex64)
        sweeps += done_in_call
        _atomic_savez(state_path,
                      Q=Qh,
                      X=cx.to_numpy(out.X), lam=cx.to_numpy(out.lam),
                      res=np.asarray(out.res),
                      inside=np.asarray(out.inside),
                      converged=np.asarray(bool(out.converged)),
                      sweeps=np.asarray(sweeps),
                      sweep_s=sweep_s, **extra)
        ev = {"event": "sweep", "sweep": sweeps,
              "converged": bool(out.converged),
              "max_res_inside": (float(np.asarray(out.res)[
                  np.asarray(out.inside)].max())
                  if np.asarray(out.inside).any() else None),
              "sweep_s": round(sweep_s, 2)}
        if resumed_ci is not None:
            ev["resumed_from_chunk"] = int(resumed_ci)
        _log(cdir, ev)
        print(json.dumps({"sweep": sweeps,
                          "converged": bool(out.converged),
                          "sweep_s": round(sweep_s, 2)}), flush=True)
        if use_chunk_ckpt and os.path.exists(partial_path):
            os.remove(partial_path)  # superseded by the sweep checkpoint
        if out.converged or done_in_call == 0:
            break
        # continue the block in-process: subspace and warm blocks carry
        # over directly (device-resident), jit cache stays hot
        X0 = out.Q if out.Q is not None else out.X
        warm0 = out.warm if use_warm else None
    return 0


if __name__ == "__main__":
    sys.exit(_worker(sys.argv[1]))
