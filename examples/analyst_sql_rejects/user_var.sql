SELECT @total_orders AS total
