SELECT p.user_id, count(*) AS n
FROM events p, events e
WHERE p.user_id = e.user_id
  AND p.event_type = 'purchase' AND p.value > 400
  AND e.event_type = 'error' AND e.value < 50
GROUP BY p.user_id ORDER BY p.user_id
