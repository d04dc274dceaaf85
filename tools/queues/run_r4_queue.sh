#!/bin/bash
# Round-4 TPU job queue: strictly sequential (the axon claim is exclusive).
# Each job logs to /tmp; a job failure does not stop the queue (logs tell).
cd /root/repo

echo "=== $(date) 128M standard read (the originally-faulting invocation)" >> /tmp/r4_queue.log
python tools/bench_scale.py --n 128000000 > /tmp/scale128_standard.log 2>&1
echo "128M-std exit=$?" >> /tmp/r4_queue.log

echo "=== $(date) aot" >> /tmp/r4_queue.log
python tools/bench_aot.py --n 1000000 > /tmp/aot_r4.log 2>&1
echo "aot exit=$?" >> /tmp/r4_queue.log

echo "=== $(date) fps" >> /tmp/r4_queue.log
python bench.py --fps > /tmp/fps_r4.log 2>&1
echo "fps exit=$?" >> /tmp/r4_queue.log

echo "=== $(date) 96M dbuf off" >> /tmp/r4_queue.log
python tools/bench_scale.py --n 96000000 --dbuf off \
    > /tmp/scale96_dbufoff.log 2>&1
echo "96M-off exit=$?" >> /tmp/r4_queue.log

echo "=== $(date) 96M dbuf auto (xyr at nx_pad 5632)" >> /tmp/r4_queue.log
python tools/bench_scale.py --n 96000000 \
    > /tmp/scale96_dbufauto.log 2>&1
echo "96M-auto exit=$?" >> /tmp/r4_queue.log

echo "=== $(date) 136M probe (nx_pad 6016 = the proven single-buffer edge)" >> /tmp/r4_queue.log
python tools/bench_scale.py --n 136000000 --warmup-steps 0 --bisect 150 \
    --steps 600 --reps 1 > /tmp/scale136.log 2>&1
echo "136M exit=$?" >> /tmp/r4_queue.log

echo "=== $(date) queue done" >> /tmp/r4_queue.log
