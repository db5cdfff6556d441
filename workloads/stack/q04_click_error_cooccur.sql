SELECT c.user_id, count(*) AS n_pairs
FROM events c, events e
WHERE c.user_id = e.user_id AND c.event_type = 'click'
  AND e.event_type = 'error'
  AND e.ts BETWEEN c.ts - INTERVAL 30 MINUTE
               AND c.ts + INTERVAL 30 MINUTE
GROUP BY c.user_id
