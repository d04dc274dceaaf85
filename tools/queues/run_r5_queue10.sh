#!/bin/bash
# Round-5 TPU queue #10: continue the ceiling march past 192M with the
# donor-chain rebin + shed temps (192M rebin TEMP 4.37 GiB).
# 208M refless accounting: ~10.8 GiB args (6 planes of 1.80 GiB),
# step_until TEMP 2 planes (~3.6) -> ~14.4; rebin TEMP ~4.7 -> ~15.5.
# Both sides of the wall are plausible - probe first, run regardless
# (the 192M "17.23 peak" accounting RAN clean; the formula overestimates
# overlap).  A fault brackets the ceiling at 192M; 224M probe documents
# the next bracket either way.
cd /root/repo
while ! grep -q "queue9 done" /tmp/r5_queue9.log 2>/dev/null; do sleep 30; done

echo "=== $(date) probe_hbm 208M" >> /tmp/r5_queue10.log
timeout 7200 python tools/probe_hbm.py --n 208000000 > /tmp/r5_probe208.log 2>&1
echo "probe exit=$?" >> /tmp/r5_queue10.log

echo "=== $(date) 208M refless" >> /tmp/r5_queue10.log
timeout 21600 python tools/bench_scale.py --n 208000000 --warmup-steps 0 \
    --bisect 150 --steps 600 --reps 1 > /tmp/r5_scale208.log 2>&1
echo "208M exit=$?" >> /tmp/r5_queue10.log

echo "=== $(date) probe_hbm 224M (bracket documentation)" >> /tmp/r5_queue10.log
timeout 7200 python tools/probe_hbm.py --n 224000000 > /tmp/r5_probe224.log 2>&1
echo "probe224 exit=$?" >> /tmp/r5_queue10.log
echo "=== $(date) queue10 done" >> /tmp/r5_queue10.log
