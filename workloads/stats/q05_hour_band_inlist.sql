SELECT a.event_type, b.event_type AS event_type_b, count(*) AS n
FROM events a, events b
WHERE a.user_id = b.user_id
  AND a.event_type IN ('click', 'view') AND b.event_type IN ('error', 'purchase')
  AND extract(hour FROM a.ts) BETWEEN 8 AND 11
  AND extract(hour FROM b.ts) BETWEEN 8 AND 11
  AND a.value > b.value
GROUP BY a.event_type, b.event_type ORDER BY a.event_type, event_type_b
