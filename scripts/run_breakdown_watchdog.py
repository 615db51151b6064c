"""Drive scripts/tpu_breakdown.py one tag per subprocess with STALL
detection: the axon tunnel's remote compile occasionally hangs forever
(round-5 observation: ~1 in 3 large fresh compiles; the process sits at
<1% CPU with no output).  A fixed timeout cannot separate a hang from a
legitimately slow 20-minute tag, so instead kill only when the tag's
log has not grown for `stall` seconds, and retry once.

Usage: python scripts/run_breakdown_watchdog.py [out.log] [tag ...]
"""
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def run_tag(tag, out, stall=600, retries=2):
    for attempt in range(1, retries + 1):
        out.write(f'# tag={tag} attempt={attempt}\n')
        out.flush()
        p = subprocess.Popen(
            [sys.executable, str(ROOT / 'scripts' / 'tpu_breakdown.py'),
             tag], stdout=out, stderr=subprocess.STDOUT, cwd=str(ROOT),
            start_new_session=True)
        lastSize = -1
        lastGrow = time.time()
        while True:
            rc = p.poll()
            if rc is not None:
                out.write(f'# tag={tag} attempt={attempt} rc={rc}\n')
                out.flush()
                if rc == 0:
                    return True
                break
            size = os.path.getsize(out.name)
            if size != lastSize:
                lastSize = size
                lastGrow = time.time()
            if time.time() - lastGrow > stall:
                out.write(f'# tag={tag} attempt={attempt} STALLED '
                          f'({stall}s no output) - killing\n')
                out.flush()
                os.killpg(p.pid, signal.SIGKILL)
                p.wait()
                break
            time.sleep(10)
        time.sleep(20)
    return False


def main():
    logPath = sys.argv[1] if len(sys.argv) > 1 else '/tmp/breakdown.log'
    tags = sys.argv[2:]
    if not tags:
        sys.path.insert(0, str(ROOT / 'scripts'))
        tags = ['pallas_blocked', 'mixed', 'f32accum', 'mixed_fused',
                'mixed_pallas', 'f64']
    with open(logPath, 'a') as out:
        for tag in tags:
            ok = run_tag(tag, out)
            out.write(f'# tag={tag} final_ok={ok}\n')
            out.flush()
        out.write('# all done\n')


if __name__ == '__main__':
    main()
