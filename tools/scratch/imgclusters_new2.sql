WITH RECURSIVE
 bb AS (SELECT bs.base, (t2.range // 2) * 8 + (t1.range // 3) AS k,
          sum((bs.base*31 + t1.range*7 + t2.range*13) % 256
            + (bs.base*17 + t1.range*11 + t2.range*5) % 256
            + (bs.base*23 + t1.range*3 + t2.range*19) % 256) AS bs0
        FROM range(0, 64) bs(base), range(0, 24) t1, range(0, 16) t2
        GROUP BY 1, 2),
 bbl AS (SELECT base, list(bs0 ORDER BY k) AS bl FROM bb GROUP BY base),
 dd AS (SELECT doc_id, doc_id % 64 AS base, doc_id // 64 AS v FROM documents),
 dk AS (SELECT doc_id, base, v, v % 24 AS xd, (v // 24) % 16 AS yd FROM dd),
 dj AS (SELECT doc_id, base, v,
               ((yd // 2) * 8 + (xd // 3)) AS kd,
               ((base*31 + xd*7 + yd*13) % 256 + 128) % 256
                 - (base*31 + xd*7 + yd*13) % 256 AS delta
        FROM dk),
 h0 AS (SELECT d.doc_id,
               list_transform(b.bl, (x, i) ->
                 x + CASE WHEN d.v > 0 AND i - 1 = d.kd
                          THEN d.delta ELSE 0 END) AS bs
        FROM dj d JOIN bbl b USING (base)),
 h1 AS (SELECT doc_id, bs, list_sum(bs) AS ts FROM h0),
 h2 AS (SELECT doc_id,
          list_transform(range(0, 4), b ->
            list_sum(list_transform(range(0, 16), j ->
              CASE WHEN 64 * bs[16 * b + j + 1] > ts
                   THEN (1::BIGINT << j) ELSE 0::BIGINT END))) AS bvl
        FROM h1),
 hk AS (SELECT doc_id, bvl,
               array_to_string(bvl, ',') AS hkey FROM h2),
 reps AS (SELECT hkey, min(doc_id) AS rep FROM hk GROUP BY 1),
 member AS (SELECT r.rep AS id_a, h.doc_id AS id_b
            FROM hk h JOIN reps r USING (hkey) WHERE h.doc_id <> r.rep),
 rb AS (SELECT h.doc_id, u.band - 1 AS band, h.bvl[u.band] AS bv
        FROM hk h JOIN reps r ON h.doc_id = r.rep,
             unnest(range(1, 5)) u(band)),
 cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
          FROM rb a JOIN rb b ON a.band = b.band AND a.bv = b.bv
          WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
 nearp AS (SELECT c.id_a, c.id_b
           FROM cand c JOIN rb x ON x.doc_id = c.id_a
           JOIN rb y ON y.doc_id = c.id_b AND y.band = x.band
           GROUP BY 1, 2
           HAVING sum(bit_count(xor(x.bv, y.bv))) <= 2),
 -- connected components over REPS ONLY (474 nodes at the 100x replica):
 -- member edges are rep-stars (rep = min id of its identical-hash group,
 -- so every member id >= its rep), hence a component's min id is the min
 -- over its reps and each member inherits its rep's cluster. The direct
 -- all-labels closure over member edges was Theta(|cluster|^2) rows —
 -- 527M at the 100x replica (the round-13 sweep OOM)
 rne AS (SELECT id_a AS a, id_b AS b FROM nearp
         UNION SELECT id_b, id_a FROM nearp),
 rl AS (SELECT a AS id, a AS c FROM rne
        UNION
        SELECT e2.a, rl.c FROM rne e2 JOIN rl ON rl.id = e2.b),
 rc AS (SELECT id AS rep, min(c) AS cl FROM rl GROUP BY id),
 nodes AS (SELECT id_a AS id, id_a AS rep FROM member
           UNION SELECT id_b, id_a FROM member
           UNION SELECT id_a, id_a FROM nearp
           UNION SELECT id_b, id_b FROM nearp)
 SELECT n.id, min(coalesce(rc.cl, n.rep))::BIGINT AS cluster
 FROM nodes n LEFT JOIN rc ON rc.rep = n.rep GROUP BY n.id