SELECT s.user_id, count(*) AS n
FROM events s, events v, events c, events p
WHERE s.user_id = v.user_id AND v.user_id = c.user_id AND c.user_id = p.user_id
  AND s.event_type = 'signup' AND v.event_type = 'view'
  AND c.event_type = 'click' AND p.event_type = 'purchase'
  AND s.ts < v.ts AND v.ts < c.ts AND c.ts < p.ts
  AND p.value > 300
GROUP BY s.user_id ORDER BY s.user_id
