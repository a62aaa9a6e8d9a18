"""Experiment runner: trials across TPU devices, ASHA early stopping.

Replaces both of the reference's execution modes (SURVEY.md 2.3):

- standalone serial trials (``run_standalong_training``,
  utils/train_utils.py:47-82) -> ``n_parallel=1``;
- Ray Tune fractional-GPU trial packing (run_train_raytune.py:303-315)
  -> one trial per TPU device, dispatched to worker threads each pinned
  to a device via ``jax.default_device`` (trials are independent; no
  collectives needed).

Failure handling parity: a trial that raises is recorded in
``<trial>/error.txt``; ``rerun_failed`` re-runs only errored trials
(ref ``resume='ERRORED_ONLY'``, run_train_raytune.py:233-236,314).
The ``after_min_loss >= 3`` stop rule mirrors ``stop={'after_min_loss':
3}`` (:308).
"""

from __future__ import annotations

import dataclasses
import os
import random
import threading
import traceback
from typing import Callable, Dict, List, Optional

import numpy as np

from mural_tpu.train.loop import TrainOptions, train_trial
from mural_tpu.tune.asha import ASHAScheduler
from mural_tpu.tune.space import sample_config
from mural_tpu.utils.trials import (generate_trial_id,
                                    scan_experiment_best,
                                    write_progress_csv)

AFTER_MIN_LOSS_STOP = 3


@dataclasses.dataclass
class ExperimentOptions:
    experiment_name: str
    results_dir: str = "./results"
    n_trials: int = 2
    epochs: int = 10
    grace_period: int = 5
    asha_metric: str = "loss"
    use_scheduler: bool = False       # reference's --use_ray analogue
    n_parallel: int = 1               # trials run concurrently (devices)
    rerun_failed: bool = False
    seed: Optional[int] = None
    progress_interval: float = 30.0   # live table cadence (scheduler mode)
    trial_executor: str = "thread"    # 'thread' | 'process': concurrent
                                      # trials share one process (native
                                      # gathers release the GIL) or get
                                      # spawned processes (no GIL
                                      # contention from pandas eval
                                      # tails on many-core hosts)
    ensemble: str = "off"             # 'off' | 'auto': vmap same-shape
                                      # trials into ONE program per
                                      # device (tune/ensemble.py) -- the
                                      # TPU answer to Ray's fractional-
                                      # GPU packing


class ProgressTable:
    """Live trial-status table (the reference's Ray CLIReporter
    analogue, run_train_raytune.py:294): a daemon thread prints one
    PrettyTable of every trial's latest metrics at a fixed cadence while
    trials run."""

    COLS = ["trial", "status", "iter", "loss", "fdiri_loss",
            "after_min_loss"]

    def __init__(self, printer=print, interval: float = 30.0):
        self.printer = printer
        self.interval = interval
        self._rows: Dict[str, Dict] = {}
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    def update(self, trial_id: str, status: str, iteration: int = 0,
               metrics: Optional[Dict] = None) -> None:
        with self._lock:
            row = self._rows.setdefault(trial_id, {})
            row["status"] = status
            if iteration:
                row["iter"] = iteration
            if metrics:
                row.update({k: metrics[k] for k in
                            ("loss", "fdiri_loss", "after_min_loss")
                            if k in metrics})

    def render(self) -> str:
        from mural_tpu.utils.params import format_table
        rows = []
        with self._lock:
            for trial_id in sorted(self._rows):
                row = self._rows[trial_id]
                rows.append([trial_id, row.get("status", "?"),
                             row.get("iter", 0)]
                            + [(f"{row[k]:.5g}" if k in row else "-")
                               for k in ("loss", "fdiri_loss")]
                            + [row.get("after_min_loss", "-")])
        return format_table(self.COLS, rows)

    def _loop(self):
        while not self._stop.wait(self.interval):
            self.printer(self.render())

    def start(self):
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def stop(self):
        self._stop.set()
        if self._thread is not None:
            self._thread.join()
        self.printer(self.render())


def _trial_worker(trial_id: str, config: Dict, opts: TrainOptions,
                  model_type: str, scheduler: Optional[ASHAScheduler],
                  device=None, progress: Optional[ProgressTable] = None):
    import jax

    iteration = {"n": 0}

    def report(metrics: Dict) -> bool:
        iteration["n"] += 1
        if progress is not None:
            progress.update(trial_id, "RUNNING", iteration["n"], metrics)
        if metrics.get("after_min_loss", 0) >= AFTER_MIN_LOSS_STOP:
            return False
        if scheduler is not None:
            return scheduler.on_report(trial_id, iteration["n"], metrics)
        return True

    try:
        if device is not None:
            with jax.default_device(device):
                metrics = train_trial(config, opts, model_type,
                                      report_fn=report)
        else:
            metrics = train_trial(config, opts, model_type,
                                  report_fn=report)
        return trial_id, metrics, None
    except Exception as err:  # recorded for rerun_failed
        os.makedirs(opts.trial_dir, exist_ok=True)
        with open(os.path.join(opts.trial_dir, "error.txt"), "w") as fh:
            fh.write(traceback.format_exc())
        return trial_id, None, err


class _SchedulerBridge:
    """Child-process side of the trial<->scheduler protocol: forwards
    each epoch report over the pipe and blocks on the parent's
    keep-going verdict (the parent owns the real ASHAScheduler, so
    cross-trial promotion decisions see every trial's reports)."""

    def __init__(self, conn):
        self.conn = conn

    def on_report(self, trial_id, iteration, metrics) -> bool:
        self.conn.send(("report", iteration, metrics))
        return bool(self.conn.recv())


def _process_entry(conn, trial_id, config, opts, model_type,
                   device_index, n_parallel, platforms):
    """Spawned-process trial body: initialises its own JAX runtime on
    the parent's platform and pins to the same device slot the threaded
    executor would use (``launch_idx % n_parallel``, confining packed
    trials to the first ``n_parallel`` devices).

    ``platforms`` is the parent's ``jax_platforms`` config, applied via
    ``jax.config`` -- the env var alone is NOT enough (a site
    customisation can force-register an accelerator backend regardless,
    and the child must match the parent's platform for trial
    equivalence).

    On a real TPU VM with local libtpu a child process cannot attach to
    chips the parent runtime already holds; best-effort per-process chip
    isolation is requested via the standard env vars (settable by the
    user first -- ``setdefault`` never overrides), which makes each
    child see exactly its own chip where the deployment supports it."""
    try:
        if not platforms or "cpu" not in str(platforms):
            slot = str(device_index % max(n_parallel, 1))
            os.environ.setdefault("TPU_VISIBLE_DEVICES", slot)
            os.environ.setdefault("TPU_VISIBLE_CHIPS", slot)
        import jax
        if platforms:
            jax.config.update("jax_platforms", platforms)
        dev = None
        if n_parallel > 1:
            devs = jax.devices()
            # matches the threaded executor's launch_idx % n_parallel;
            # an env-isolated TPU child sees a single device (len 1)
            dev = devs[device_index % min(n_parallel, len(devs))]
        out = _trial_worker(trial_id, config, opts, model_type,
                            _SchedulerBridge(conn), device=dev,
                            progress=None)
        conn.send(("done", out[1],
                   None if out[2] is None else repr(out[2])))
    except BaseException as err:   # never leave the parent hanging
        try:
            conn.send(("done", None, repr(err)))
        except Exception:
            pass
    finally:
        conn.close()


def _run_trial_in_process(trial_id, config, opts, model_type,
                          scheduler, device_index, n_parallel,
                          progress):
    """Parent side: spawn, then serve scheduler verdicts until done."""
    import multiprocessing as mp

    import jax

    ctx = mp.get_context("spawn")
    parent, child = ctx.Pipe()
    proc = ctx.Process(
        target=_process_entry,
        args=(child, trial_id, config, opts, model_type, device_index,
              n_parallel, jax.config.jax_platforms),
        daemon=False)
    proc.start()
    child.close()
    metrics, err_repr = None, None
    iteration = 0
    try:
        while True:
            try:
                msg = parent.recv()
            except EOFError:        # child died without 'done'
                err_repr = "trial process exited unexpectedly"
                break
            if msg[0] == "report":
                _, iteration, m = msg
                if progress is not None:
                    progress.update(trial_id, "RUNNING", iteration, m)
                keep = True
                if m.get("after_min_loss", 0) >= AFTER_MIN_LOSS_STOP:
                    keep = False
                if keep and scheduler is not None:
                    keep = scheduler.on_report(trial_id, iteration, m)
                parent.send(keep)
            else:                   # ("done", metrics, err_repr)
                _, metrics, err_repr = msg
                break
    finally:
        # a scheduler/progress exception above would otherwise leave the
        # child blocked on conn.recv() and this thread stuck in join()
        if proc.is_alive() and err_repr is None and metrics is None:
            proc.terminate()
        proc.join()
        parent.close()
    err = RuntimeError(err_repr) if err_repr is not None else None
    if err is not None and metrics is None:
        # make sure rerun_failed sees the failure even if the child
        # crashed before _trial_worker could write it
        err_path = os.path.join(opts.trial_dir, "error.txt")
        if not os.path.exists(err_path):
            os.makedirs(opts.trial_dir, exist_ok=True)
            with open(err_path, "w") as fh:
                fh.write(str(err_repr) + "\n")
    return trial_id, metrics, err


def run_experiment(space: Dict, base_opts: TrainOptions, model_type: str,
                   exp: ExperimentOptions,
                   printer=print) -> List:
    """Sample + run ``n_trials`` configs.  Returns the sorted best-model
    list [(checkpoint_path, loss), ...]."""
    from mural_tpu.utils.pandas_safe import ensure_object_strings
    ensure_object_strings()
    import jax

    exp_dir = os.path.join(exp.results_dir, exp.experiment_name)
    os.makedirs(exp_dir, exist_ok=True)

    rng = np.random.default_rng(exp.seed)
    id_rng = random.Random(exp.seed)

    scheduler = None
    progress = None
    if exp.use_scheduler:
        scheduler = ASHAScheduler(metric=exp.asha_metric, mode="min",
                                  max_t=exp.epochs,
                                  grace_period=exp.grace_period)
        # the reference's Ray mode shows a CLIReporter table; mirror it
        progress = ProgressTable(printer=printer,
                                 interval=exp.progress_interval)
        progress.start()

    # assemble trial list (fresh, or only errored ones on rerun_failed)
    import pickle
    trials = []
    if exp.rerun_failed:
        for name in sorted(os.listdir(exp_dir)):
            tdir = os.path.join(exp_dir, name)
            if os.path.isdir(tdir) and os.path.exists(
                    os.path.join(tdir, "error.txt")):
                # resume the trial's ORIGINAL config (parity with the
                # reference's resume='ERRORED_ONLY'), persisted at launch
                cfg_path = os.path.join(tdir, "trial_config.pkl")
                if os.path.exists(cfg_path):
                    with open(cfg_path, "rb") as fh:
                        trials.append((name, pickle.load(fh)))
                else:
                    trials.append((name, sample_config(space, rng)))
        printer(f"rerun_failed: re-running {len(trials)} errored trials")
    else:
        for i in range(exp.n_trials):
            trials.append((generate_trial_id(i, id_rng),
                           sample_config(space, rng)))

    devices = jax.devices()
    n_parallel = min(max(exp.n_parallel, 1), max(len(devices), 1))

    results = []
    lock = threading.Lock()
    launch_counter = [0]

    # --- vmapped trial ensembles (tune/ensemble.py) --------------------
    # same-program-shape groups train as ONE vmapped dispatch; groups
    # that can't (host-path data, over budget, transfer, singletons)
    # fall through to the per-trial executors below
    if exp.ensemble == "auto" and len(trials) >= 2:
        from mural_tpu.tune.ensemble import (ensemble_eligible,
                                             group_trials,
                                             run_ensemble_group)
        remaining = []
        rem_lock = threading.Lock()

        def run_group(g, device):
            opts_g = (dataclasses.replace(base_opts, device=device)
                      if device is not None else base_opts)
            if progress is not None:
                for tid, _ in g:
                    progress.update(tid, "RUNNING")
            try:
                out = run_ensemble_group(g, opts_g, model_type, exp,
                                         scheduler, progress, printer)
            except Exception as err:     # group-wide failure
                import traceback
                tb = traceback.format_exc()
                out = []
                for tid, _ in g:
                    tdir = os.path.join(exp_dir, tid)
                    os.makedirs(tdir, exist_ok=True)
                    with open(os.path.join(tdir, "error.txt"),
                              "w") as fh:
                        fh.write(tb)
                    out.append((tid, None, err))
            if out is None:              # fallback requested
                with rem_lock:
                    remaining.extend(g)
                return
            for r in out:
                with rem_lock:
                    results.append(r)
                if r[2] is not None:
                    if progress is not None:
                        progress.update(r[0], "ERROR")
                    printer(f"Trial {r[0]} FAILED: {r[2]}")
                else:
                    if progress is not None:
                        progress.update(r[0], "TERMINATED")
                    printer(f"Trial {r[0]} finished: loss="
                            f"{r[1].get('loss'):.6g}")

        groups, singles = [], []
        for g in group_trials(trials):
            if len(g) >= 2 and ensemble_eligible(g[0][1], base_opts):
                groups.append(g)
            else:
                singles.extend(g)
        if n_parallel > 1 and len(groups) > 1:
            # one group per device, the trial-packing layout a v5e-8
            # wants: n_parallel groups x T members train concurrently
            gsem = threading.Semaphore(n_parallel)
            gthreads = []
            for i, g in enumerate(groups):
                def guarded_group(g=g, dev=devices[i % n_parallel]):
                    with gsem:
                        run_group(g, dev)
                th = threading.Thread(target=guarded_group)
                th.start()
                gthreads.append(th)
            for th in gthreads:
                th.join()
        else:
            for g in groups:
                run_group(g, None)
        trials = remaining + singles

    def launch(idx_trial):
        trial_id, config = idx_trial
        trial_dir = os.path.join(exp_dir, trial_id)
        os.makedirs(trial_dir, exist_ok=True)
        err_path = os.path.join(trial_dir, "error.txt")
        if os.path.exists(err_path):
            os.remove(err_path)
        # every trial gets its own init/shuffle seed -- otherwise repeat
        # trials of an identical config are bit-identical and useless
        trial_seed = (base_opts.rng_seed
                      + int(trial_id.rsplit("_", 1)[-1]))
        opts = dataclasses.replace(
            base_opts, trial_dir=trial_dir,
            trial_training_log=os.path.join(trial_dir, "training.log"),
            epochs=exp.epochs, grace_period=exp.grace_period,
            rng_seed=trial_seed)
        dev = None
        with lock:
            launch_idx = launch_counter[0]
            launch_counter[0] += 1
        if n_parallel > 1:
            # round-robin over LAUNCH order (completed-trial count would
            # pin all concurrent starters to device 0)
            dev = devices[launch_idx % n_parallel]
        with open(os.path.join(trial_dir, "trial_config.pkl"),
                  "wb") as fh:
            import pickle
            pickle.dump(config, fh)
        if progress is not None:
            progress.update(trial_id, "RUNNING")
        if exp.trial_executor == "process":
            out = _run_trial_in_process(
                trial_id, config, opts, model_type, scheduler,
                launch_idx, n_parallel, progress)
        else:
            out = _trial_worker(trial_id, config, opts, model_type,
                                scheduler, device=dev, progress=progress)
        with lock:
            results.append(out)
        write_progress_csv(trial_dir)
        if out[2] is not None:
            if progress is not None:
                progress.update(trial_id, "ERROR")
            printer(f"Trial {trial_id} FAILED: {out[2]}")
        else:
            if progress is not None:
                progress.update(trial_id, "TERMINATED")
            printer(f"Trial {trial_id} finished: loss="
                    f"{out[1].get('loss'):.6g}")

    if n_parallel <= 1:
        for t in trials:
            launch(t)
    else:
        threads = []
        sem = threading.Semaphore(n_parallel)

        def guarded(t):
            with sem:
                launch(t)

        for t in trials:
            th = threading.Thread(target=guarded, args=(t,))
            th.start()
            threads.append(th)
        for th in threads:
            th.join()

    if progress is not None:
        progress.stop()
    best = scan_experiment_best(exp_dir, metric="loss")
    if best:
        printer("Best checkpoints by validation loss:")
        for path, loss in best[:10]:
            printer(f"  {loss:.6g}  {path}")
        with open(os.path.join(exp_dir, "best_models.txt"), "w") as fh:
            for path, loss in best:
                fh.write(f"{loss}\t{path}\n")
    return best
