"""Experiment sweep runner + watch-dir job daemon.

Covers the reference's experiment orchestration layer: the per-GPU scene
sweep shell scripts (`alky/jobs1.sh`, `masknerf*.sh`) become `sweep`, and
the ModelArts S3-polling daemon (`s3helper_job7_start.py:36-73` — watch a
bucket for `{job}.sh`, run it, kill on a stop-sign file) becomes `watch`
over a local/NFS directory: drop a `*.job` file containing CLI args, the
daemon runs it; drop `<name>.stop` to cancel.

Usage:
  python -m consistentnerf_tpu.cli.jobs sweep --preset-glob "lego_*view"
  python -m consistentnerf_tpu.cli.jobs watch /path/to/jobdir
"""

from __future__ import annotations

import argparse
import fnmatch
import os
import shlex
import subprocess
import sys
import time


def run_one(args_list, log_path=None):
    cmd = [sys.executable, "-m", "consistentnerf_tpu.cli.train"] + args_list
    print("+", " ".join(cmd), flush=True)
    stdout = open(log_path, "a") if log_path else None
    try:
        return subprocess.run(
            cmd, stdout=stdout or None,
            stderr=subprocess.STDOUT if stdout else None,
        ).returncode
    finally:
        if stdout:
            stdout.close()


def sweep(preset_glob: str, extra_args, dry_run=False):
    from consistentnerf_tpu.configs import scenes

    names = [n for n in scenes.list_scenes()
             if fnmatch.fnmatch(n, preset_glob)]
    if not names:
        raise SystemExit(f"no presets match {preset_glob!r}")
    print(f"sweeping {len(names)} presets: {names}")
    failures = []
    for name in names:
        if dry_run:
            continue
        rc = run_one(["--scene", name] + list(extra_args))
        if rc != 0:
            failures.append(name)
    if failures:
        raise SystemExit(f"failed presets: {failures}")


def watch(jobdir: str, poll_s: float = 10.0):
    os.makedirs(jobdir, exist_ok=True)
    print(f"watching {jobdir} for *.job files (stop with <name>.stop)")
    running: dict = {}
    while True:
        for f in sorted(os.listdir(jobdir)):
            path = os.path.join(jobdir, f)
            if f.endswith(".job") and f not in running:
                args = shlex.split(open(path).read())
                log = path.replace(".job", ".log")
                cmd = [sys.executable, "-m",
                       "consistentnerf_tpu.cli.train"] + args
                print("+ starting", f, flush=True)
                running[f] = subprocess.Popen(
                    cmd, stdout=open(log, "w"), stderr=subprocess.STDOUT
                )
            if f.endswith(".stop"):
                name = f[:-5] + ".job"
                proc = running.pop(name, None)
                if proc is not None:
                    print("+ stopping", name, flush=True)
                    proc.terminate()
                os.remove(path)
        for name, proc in list(running.items()):
            if proc.poll() is not None:
                print(f"+ finished {name} rc={proc.returncode}", flush=True)
                done = os.path.join(jobdir, name + ".done")
                open(done, "w").write(str(proc.returncode))
                running.pop(name)
        time.sleep(poll_s)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    ps = sub.add_parser("sweep")
    ps.add_argument("--preset-glob", required=True)
    ps.add_argument("--dry-run", action="store_true")
    ps.add_argument("extra", nargs="*",
                    help="extra args passed to every train run")
    pw = sub.add_parser("watch")
    pw.add_argument("jobdir")
    pw.add_argument("--poll", type=float, default=10.0)
    args = p.parse_args(argv)
    if args.cmd == "sweep":
        sweep(args.preset_glob, args.extra, args.dry_run)
    else:
        watch(args.jobdir, args.poll)


if __name__ == "__main__":
    main()
