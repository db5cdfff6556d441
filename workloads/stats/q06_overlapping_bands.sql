SELECT x.user_id, min(x.value) AS lo, max(z.value) AS hi
FROM events x, events y, events z
WHERE x.user_id = y.user_id AND y.user_id = z.user_id
  AND x.value BETWEEN 50 AND 150
  AND y.value BETWEEN 100 AND 200
  AND z.value BETWEEN 150 AND 250
  AND x.event_type = 'view' AND y.event_type = 'click' AND z.event_type = 'purchase'
GROUP BY x.user_id ORDER BY x.user_id
