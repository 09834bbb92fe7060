#!/bin/bash
# Waits for the axon TPU relay to answer, then runs the round-3 on-chip
# campaign: device-aug phase probes + the multi-metric bench portfolio.
# Writes logs under /tmp/chip_campaign/ and BENCH_PORTFOLIO.json at the
# repo root. Safe to re-run; exits after one full campaign.
set -u
cd /root/repo
mkdir -p /tmp/chip_campaign

probe_attach() {
    timeout 120 python -u -c "import jax; print(jax.devices())" \
        > /tmp/chip_campaign/attach.log 2>&1
}

echo "$(date -u +%H:%M:%S) waiting for relay..." >> /tmp/chip_campaign/status
for i in $(seq 1 40); do                      # up to ~7h of 10-min waits
    if probe_attach; then
        echo "$(date -u +%H:%M:%S) relay UP (iter $i)" >> /tmp/chip_campaign/status
        break
    fi
    echo "$(date -u +%H:%M:%S) still down (iter $i)" >> /tmp/chip_campaign/status
    sleep 600
done
probe_attach || { echo "relay never came back" >> /tmp/chip_campaign/status; exit 3; }

# 1) device-aug phase anatomy (new gather-free formulations)
for p in lut hist blends warp_slice3 full; do
    timeout 420 python -u perf/device_aug_probe.py "$p" \
        > "/tmp/chip_campaign/aug_$p.log" 2>&1
    echo "$(date -u +%H:%M:%S) aug_$p rc=$?" >> /tmp/chip_campaign/status
done

# 2) the full bench portfolio -> BENCH_PORTFOLIO.json
timeout 5400 python -u bench_all.py --save \
    > /tmp/chip_campaign/portfolio.log 2>&1
echo "$(date -u +%H:%M:%S) portfolio rc=$?" >> /tmp/chip_campaign/status

# 3) headline bench line (embeds the portfolio)
timeout 1200 python -u bench.py > /tmp/chip_campaign/bench.log 2>&1
echo "$(date -u +%H:%M:%S) bench rc=$?" >> /tmp/chip_campaign/status
echo done >> /tmp/chip_campaign/status
