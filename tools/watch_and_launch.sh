#!/bin/bash
# Wait for the full fixture, then launch the full-preset TPU bank and
# resume the paused CPU dryrun compile.
cd /root/repo
while true; do
  if grep -q "golden verify ok" .bank/fullfix.log 2>/dev/null; then
    echo "$(date) fixture ready; launching bank_full" >> .bank/watcher.log
    setsid nohup python tools/bank_full.py > .bank/full.log 2>&1 < /dev/null &
    DPID=$(ps aux | grep bank_dryrun | grep -v grep | awk '{print $2}')
    if [ -n "$DPID" ]; then kill -CONT $DPID; echo "resumed dryrun $DPID" >> .bank/watcher.log; fi
    break
  fi
  if ! ps aux | grep gen_full_fixture | grep -v grep > /dev/null; then
    echo "$(date) gen_full died without fixture" >> .bank/watcher.log
    DPID=$(ps aux | grep bank_dryrun | grep -v grep | awk '{print $2}')
    if [ -n "$DPID" ]; then kill -CONT $DPID; fi
    break
  fi
  sleep 30
done
