#!/usr/bin/env node
// Measures the REFERENCE'S algorithmic shape for its dedup-merge transform:
// a per-record accumulator with a linear membership scan (the reference's
// promotions transform is reduce + findIndex over a plain array —
// /root/reference packages/app/bundles/custom/models/ETL.ts:15-27), i.e.
// O(n * distinct_keys). This harness is original code reproducing only the
// complexity class, on synthetic rows shaped like the driver's lineitem
// (n rows, n/4 distinct keys), so BASELINE.md can cite a measured
// single-node number for the engine the project replaces.
//
// Usage: node ref_shape_bench.js [rows]
const n = parseInt(process.argv[2] || "60000", 10);
const keys = Math.max(1, Math.floor(n / 4));

const rows = new Array(n);
for (let i = 0; i < n; i++) {
  rows[i] = { key: i % keys, qty: (i * 7) % 50, member: "m" + (i % 97) };
}

const t0 = process.hrtime.bigint();
const acc = [];
for (const r of rows) {
  let hit = -1;
  for (let j = 0; j < acc.length; j++) {      // linear scan, as the reference does
    if (acc[j].key === r.key) { hit = j; break; }
  }
  if (hit === -1) {
    acc.push({ key: r.key, qty: r.qty, members: [r.member] });
  } else if (!acc[hit].members.includes(r.member)) {
    acc[hit].members.push(r.member);
  }
}
const sec = Number(process.hrtime.bigint() - t0) / 1e9;
console.log(JSON.stringify({ rows: n, distinct_keys: keys, groups: acc.length, sec: +sec.toFixed(3) }));
