"""Poll the TPU tunnel; when alive, run the benchmark battery and save
results to _tpu_results.txt.  (Scratch tool, not part of the package.)"""
import subprocess
import sys
import time

OUT = "/root/repo/_tpu_results.txt"


def log(msg):
    with open(OUT, "a") as f:
        f.write(msg + "\n")
    print(msg, flush=True)


def probe(timeout=60):
    code = subprocess.run(
        [sys.executable, "-u", "-c",
         "import jax, jax.numpy as jnp;"
         "print(float(jnp.sum(jnp.ones((256,256))@jnp.ones((256,256)))))"],
        capture_output=True, timeout=timeout + 5, text=True,
        errors="replace").returncode
    return code == 0


def run(cmd, tmo):
    t0 = time.time()
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=tmo,
                           errors="replace")
        out = (r.stdout + r.stderr)
        out = "\n".join(l for l in out.splitlines()
                        if "WARNING" not in l)[-3000:]
        log(f"$ {' '.join(cmd[2:])} ({time.time()-t0:.0f}s, rc={r.returncode})"
            f"\n{out}\n")
    except subprocess.TimeoutExpired:
        log(f"$ {' '.join(cmd[2:])} TIMED OUT after {tmo}s\n")


def main():
    deadline = time.time() + 50 * 60
    while time.time() < deadline:
        try:
            if probe():
                log(f"tunnel alive at {time.strftime('%H:%M:%S')}")
                break
        except Exception as e:
            pass
        time.sleep(60)
    else:
        log("tunnel never came back")
        return

    py = sys.executable
    run([py, "-u", "/root/repo/bench.py"], 900)
    run([py, "-u", "-m", "dhd_tpu.cli.benchmark", "--preset", "dhd_s",
         "--what", "stages", "--iters", "10"], 1500)
    run([py, "-u", "/root/repo/_pool_compare.py"], 900)
    run([py, "-u", "-m", "dhd_tpu.cli.benchmark", "--preset", "dhd_s",
         "--what", "train", "--batch-size", "4", "--iters", "5"], 1500)


if __name__ == "__main__":
    main()
